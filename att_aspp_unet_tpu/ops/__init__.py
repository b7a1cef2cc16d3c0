"""Low-level XLA/Pallas image + compute kernels.

These replace the per-frame OpenCV/ITK C++ calls of the reference
(``/root/reference/inference.py:173-177`` etc.) with batched device-side
programs: one XLA computation processes a whole sweep.
"""

from .image import (  # noqa: F401
    gaussian_blur,
    median3x3,
    minmax_normalize_u8,
    resize_bilinear,
    resize_nearest,
    sobel_gradients,
)
from .clahe import clahe  # noqa: F401
