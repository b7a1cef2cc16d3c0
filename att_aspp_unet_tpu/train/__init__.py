"""Training: loss zoo, device-side augmentation, host data pipeline, and the
data-parallel train loop (optax + orbax + pjit over the mesh)."""

from .losses import (  # noqa: F401
    bce_with_logits,
    build_criterion,
    combo_loss,
    dice_loss,
    edge_loss,
    iou_score,
    tversky_loss,
)
