"""Device-side sweep preprocessing.

Replaces reference layer L1 (``inference.py:147-190``,
``model_attention_aspp.py:11-17``, ``convert_to_png.py``): per-frame
min-max→CLAHE→median-3 enhancement, percentile normalisation, and the
intensity-centroid ROI crop — all batched over the frame axis on device.
"""

from .enhance import enhance_frames, preprocess_sweep, percentile_normalize_u8  # noqa: F401
from .roi import crop_roi, paste_roi_probs  # noqa: F401
