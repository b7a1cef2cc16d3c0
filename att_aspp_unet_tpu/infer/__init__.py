"""Sweep inference engines + deployment contract."""

from .engine import (  # noqa: F401
    AttAsppEngine,
    BaselineEngine,
    forward_probs_tta,
    predict_sweep_probs,
)
from .outputs import write_output_mha_and_json, write_segmentation_output  # noqa: F401
