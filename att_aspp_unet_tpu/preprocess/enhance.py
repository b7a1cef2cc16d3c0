"""Per-frame enhancement chain, batched over the sweep.

Reference behavior (``/root/reference/inference.py:168-190``): for every frame
of the (N, H, W) sweep — min-max normalise to uint8, CLAHE(clip=1.0, 8×8
tiles), 3×3 median blur — then stack to float32 (1, N, H, W) in [0, 1].
That was a Python loop over OpenCV calls at ~N host round-trips; here the
whole sweep is one jitted XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import clahe, median3x3, minmax_normalize_u8, resize_bilinear


@functools.partial(jax.jit, static_argnames=("clahe_clip", "clahe_grid",
                                             "median_kernel"))
def enhance_frames(frames: jax.Array, clahe_clip: float = 1.0,
                   clahe_grid: Tuple[int, int] = (8, 8),
                   median_kernel: int = 3) -> jax.Array:
    """min-max → CLAHE → median-3 on a stack of frames; returns uint8.

    ``clahe_clip <= 0`` disables the CLAHE step entirely (min-max → median
    only) — used by the cascade's no-CLAHE scout tier, whose ranking model
    is trained on unequalised input (``PredictConfig.cascade_scout_clahe``).
    cv2's own ``clipLimit`` domain is positive, so 0 is unambiguous.
    """
    u8 = minmax_normalize_u8(frames)
    if clahe_clip > 0:
        u8 = clahe(u8, clahe_clip, clahe_grid)
    if median_kernel == 3:
        u8 = median3x3(u8)
    elif median_kernel not in (0, 1):
        raise NotImplementedError(f"median kernel {median_kernel}")
    return u8


@functools.partial(jax.jit, static_argnames=("img_size", "clahe_clip",
                                             "clahe_grid", "median_kernel",
                                             "dtype"))
def preprocess_sweep(frames: jax.Array, img_size: Optional[int] = None,
                     clahe_clip: float = 1.0,
                     clahe_grid: Tuple[int, int] = (8, 8),
                     median_kernel: int = 3,
                     dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Full network-input preprocessing for a sweep.

    Enhance each frame, optionally resize to (img_size, img_size) — the order
    the reference's predict path uses (enhance at native res, then
    albumentations Resize(512); ``…stage.py:492-494``) — and scale to [0, 1].
    Returns (N, S, S) in ``dtype`` (bf16 recommended on TPU).
    """
    u8 = enhance_frames(frames, clahe_clip, clahe_grid, median_kernel)
    x = u8.astype(jnp.float32)
    if img_size is not None and (u8.shape[-2] != img_size or u8.shape[-1] != img_size):
        x = resize_bilinear(x, (img_size, img_size))
    return (x / 255.0).astype(dtype)


def percentile_normalize_u8(frames: jax.Array, lo_pct: float = 1.0,
                            hi_pct: float = 99.0) -> jax.Array:
    """Percentile(1, 99) windowed rescale to uint8, per frame.

    The dataset builder's normalisation (``convert_to_png.py``
    ``tools.convert.window_to_u8``): robust to ultrasound speckle outliers.
    """
    x = frames.astype(jnp.float32)
    flat = x.reshape(x.shape[:-2] + (-1,))
    lo = jnp.percentile(flat, lo_pct, axis=-1)[..., None, None]
    hi = jnp.percentile(flat, hi_pct, axis=-1)[..., None, None]
    y = (x - lo) / jnp.maximum(hi - lo, 1e-6) * 255.0
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
