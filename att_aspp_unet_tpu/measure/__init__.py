"""Abdominal-circumference measurement.

Replaces the reference's cv2 contour/ellipse chain
(``attention_aspp_unet_pipeline_stage.py:355-374``): direct least-squares
ellipse fitting runs on device from boundary-pixel moments; exact contour
tracing (for the <5-point arc-length fallback and for evaluation oracles)
runs on host.
"""

from .ellipse import fit_ellipse_mask, ellipse_circumference, measure_ac_mm  # noqa: F401
from .contour import trace_contour, arc_length, contour_area  # noqa: F401
