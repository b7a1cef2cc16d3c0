"""On-device postprocessing of probability maps.

Replaces the reference's scipy/skimage/cv2 host chain — connected-component
labeling (``refine_mask``, ``…stage.py:340-348``), binary dilation + largest
component (``model_attention_aspp.py:79-86``), per-class largest component
(``postprocess_probability_maps.py:61-78``), hole filling, and frame selection
— with batched XLA programs built on a segmented-scan label-propagation
primitive (no data-dependent shapes, no host round-trips).
"""

from .cc import label_components, largest_component, component_sizes  # noqa: F401
from .morphology import (  # noqa: F401
    binary_closing,
    binary_dilation,
    binary_erosion,
    fill_holes,
    structuring_ellipse,
)
from .refine import (get_binary_masks, get_positive_frames,  # noqa: F401
                     merge_annotations, postprocess_roi_stack,
                     postprocess_softmax_stack, refine_bucket_hw,
                     refine_mask, refine_mask_bucketed)
from .select import (  # noqa: F401
    select_best_frame_exact,
    boundary_mask,
    circularity,
    perimeter_estimate,
    select_best_frame,
    select_max_area_frame,
)
