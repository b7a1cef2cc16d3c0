"""Neural building blocks (flax.linen, NHWC, bf16 compute / f32 params)."""

from .blocks import (  # noqa: F401
    ASPP,
    AttentionGateV1,
    AttentionGateV2,
    ConvBNReLU,
    UpBlock,
)
