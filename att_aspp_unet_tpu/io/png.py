"""Grayscale PNG IO (PIL-backed).

Replaces the reference's ``cv2.imread(..., IMREAD_GRAYSCALE)`` /
``cv2.imwrite`` usage (e.g. ``attention_aspp_unet_pipeline_stage.py:449,460``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def read_gray_png(path) -> np.ndarray:
    """Read an image file as a uint8 grayscale array (H, W)."""
    with Image.open(path) as im:
        if im.mode != "L":
            im = im.convert("L")
        return np.asarray(im, dtype=np.uint8)


def write_gray_png(path, array: np.ndarray) -> None:
    """Write a uint8 (H, W) array as a grayscale PNG."""
    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr, mode="L").save(str(path))
