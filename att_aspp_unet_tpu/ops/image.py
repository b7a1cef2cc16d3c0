"""Batched device-side image primitives (pure XLA).

Each op takes a stack of frames ``(N, H, W)`` and runs as one fused XLA
program over the whole stack — the TPU-native replacement for the reference's
per-frame OpenCV loop (``/root/reference/inference.py:171-177``).

Semantics follow the OpenCV ops the reference used, including border modes:

- ``minmax_normalize_u8``  ≙ ``cv2.normalize(..., 0, 255, NORM_MINMAX)``
- ``median3x3``            ≙ ``cv2.medianBlur(k=3)``      (BORDER_REPLICATE)
- ``gaussian_blur``        ≙ ``cv2.GaussianBlur((k,k),0)`` (BORDER_REFLECT_101)
- ``resize_bilinear``      ≙ ``cv2.resize(INTER_LINEAR)`` (half-pixel centers)
- ``resize_nearest``       ≙ ``cv2.resize(INTER_NEAREST)``
- ``sobel_gradients``      ≙ the 3×3 Sobel pair used by EdgeLoss
  (``attention_aspp_unet_pipeline_stage.py:196-216``)
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def minmax_normalize_u8(frames: jax.Array) -> jax.Array:
    """Per-frame min-max rescale to [0, 255] → uint8.

    Matches ``cv2.normalize(sl, None, 0, 255, cv2.NORM_MINMAX)`` followed by
    ``.astype(np.uint8)``: scale by 255/(max-min), round half away from zero
    like OpenCV's saturate_cast on the double result, truncate at cast.
    Constant frames map to 0.
    """
    x = frames.astype(jnp.float32)
    lo = jnp.min(x, axis=(-2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-2, -1), keepdims=True)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 0.0)
    y = (x - lo) * scale
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# median 3×3 via a 19-exchange median-of-9 network (VPU-friendly min/max ops)
# ---------------------------------------------------------------------------

def median3x3(frames: jax.Array) -> jax.Array:
    """3×3 median filter with replicated borders (cv2.medianBlur semantics).

    Implemented as a median-of-9 sorting network (19 min/max exchanges) over
    nine statically shifted views — branch-free, fuses into a single VPU
    program, no data-dependent control flow.
    """
    dtype = frames.dtype
    x = frames
    # replicate-pad H and W by 1
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="edge")
    H, W = frames.shape[-2], frames.shape[-1]

    def sh(dy, dx):
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, dy, dy + H, axis=x.ndim - 2),
            dx, dx + W, axis=x.ndim - 1)

    p = [sh(dy, dx) for dy in range(3) for dx in range(3)]

    def ex(i, j):
        a, b = p[i], p[j]
        p[i], p[j] = jnp.minimum(a, b), jnp.maximum(a, b)

    # Paeth's median-of-9 network
    ex(1, 2); ex(4, 5); ex(7, 8)
    ex(0, 1); ex(3, 4); ex(6, 7)
    ex(1, 2); ex(4, 5); ex(7, 8)
    ex(0, 3); ex(5, 8); ex(4, 7)
    ex(3, 6); ex(1, 4); ex(2, 5)
    ex(4, 7); ex(4, 2); ex(6, 4)
    ex(4, 2)
    return p[4].astype(dtype)


# ---------------------------------------------------------------------------
# Gaussian blur
# ---------------------------------------------------------------------------

# OpenCV's fixed small-Gaussian kernels used when sigma <= 0 (getGaussianKernel
# small_gaussian_tab), as in ``cv2.GaussianBlur(prob, (5,5), 0)``.
_CV2_SMALL_GAUSSIAN = {
    1: np.array([1.0], np.float32),
    3: np.array([0.25, 0.5, 0.25], np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125], np.float32),
}


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D Gaussian kernel with OpenCV's defaulting rules."""
    if sigma <= 0 and ksize in _CV2_SMALL_GAUSSIAN:
        return _CV2_SMALL_GAUSSIAN[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    r = (ksize - 1) / 2
    xs = np.arange(ksize) - r
    k = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(frames: jax.Array, ksize: int = 5, sigma: float = 0.0) -> jax.Array:
    """Separable Gaussian blur, reflect-101 borders (cv2 BORDER_DEFAULT)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    r = ksize // 2
    x = frames.astype(jnp.float32)
    lead = x.shape[:-2]
    H, W = x.shape[-2], x.shape[-1]
    x = x.reshape((-1, H, W))
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="reflect")
    # vertical then horizontal pass as small dense contractions (fused by XLA)
    rows = sum(k[i] * xp[:, i:i + H, :] for i in range(ksize))
    out = sum(k[j] * rows[:, :, j:j + W] for j in range(ksize))
    return out.reshape(lead + (H, W)).astype(frames.dtype if
                                             jnp.issubdtype(frames.dtype, jnp.floating)
                                             else jnp.float32)


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------

def resize_bilinear(frames: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize, half-pixel centers, no antialias — the convention of
    ``cv2.resize(INTER_LINEAR)`` / albumentations Resize."""
    lead = frames.shape[:-2]
    out_shape = lead + tuple(out_hw)
    return jax.image.resize(frames.astype(jnp.float32), out_shape,
                            method="linear", antialias=False).astype(
        frames.dtype if jnp.issubdtype(frames.dtype, jnp.floating) else jnp.float32)


def resize_nearest(frames: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize (mask-safe: introduces no new values).

    Used when pasting the selected-frame mask back to native resolution
    (``/root/reference/inference.py:95-103``).
    """
    lead = frames.shape[:-2]
    out_shape = lead + tuple(out_hw)
    return jax.image.resize(frames, out_shape, method="nearest")


# ---------------------------------------------------------------------------
# Sobel
# ---------------------------------------------------------------------------

def sobel_gradients(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """3×3 Sobel gradient pair with zero padding, matching the reference
    EdgeLoss's ``F.conv2d(p, k, padding=1)`` (zeros) on (..., H, W) inputs."""
    kx = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    ky = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], jnp.float32)
    lead = x.shape[:-2]
    H, W = x.shape[-2], x.shape[-1]
    xr = x.astype(jnp.float32).reshape((-1, H, W))
    xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1)))

    def corr(k):
        return sum(k[i, j] * xp[:, i:i + H, j:j + W]
                   for i in range(3) for j in range(3))

    gx = corr(kx).reshape(lead + (H, W))
    gy = corr(ky).reshape(lead + (H, W))
    return gx, gy
