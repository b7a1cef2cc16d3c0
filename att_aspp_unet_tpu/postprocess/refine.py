"""Mask refinement and the two end-to-end postprocess paths.

- ``refine_mask``: drop components below max(20, 0.15%·image), keep the
  largest, 7×7-ellipse morphological close, fill holes
  (``attention_aspp_unet_pipeline_stage.py:340-348``) — batched over frames.
- ``postprocess_roi_stack``: the ROI deployment path — threshold 0.05, pick
  the max-area frame, 3×3 dilation, largest 8-connected component, zeros
  elsewhere (``model_attention_aspp.py:69-89``).
- ``postprocess_softmax_stack``: the nnU-Net-style baseline path — soft
  threshold, per-pixel class argmax, largest 3-D component per class
  (``postprocess_probability_maps.py:61-78``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .cc import label_components, component_sizes, largest_component
from .morphology import binary_closing, binary_dilation, fill_holes, \
    structuring_ellipse


@functools.partial(jax.jit, static_argnames=("min_area_px", "min_area_frac",
                                             "close_kernel"))
def refine_mask(masks: jax.Array, min_area_px: int = 20,
                min_area_frac: float = 0.0015,
                close_kernel: int = 7) -> jax.Array:
    """Refine binary masks (..., H, W) — reference ``refine_mask`` semantics."""
    H, W = masks.shape[-2], masks.shape[-1]
    min_area = max(min_area_px, int(min_area_frac * H * W))
    kept = largest_component(masks, connectivity=8, ndim=2, min_area=min_area)
    closed = binary_closing(kept, structuring_ellipse(close_kernel))
    # closing can only add pixels around the (single) kept component; fill
    # holes to finish
    filled = fill_holes(closed)
    # empty-input frames stay empty (closing of empty is empty, but guard the
    # degenerate all-background fill)
    any_fg = (kept.sum(axis=(-2, -1), keepdims=True) > 0)
    return jnp.where(any_fg, filled, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("threshold",))
def postprocess_roi_stack(prob: jax.Array, threshold: float = 0.05) -> jax.Array:
    """ROI-path postprocess of a (N, H, W) probability stack → (N, H, W) mask
    stack that is zero everywhere except the selected max-area frame."""
    binary = (prob > threshold).astype(jnp.uint8)
    areas = binary.sum(axis=(-2, -1))
    frame_idx = jnp.argmax(areas)
    frame = binary[frame_idx]

    dil = binary_dilation(frame, np.ones((3, 3), np.uint8), iterations=1)
    big = largest_component(dil, connectivity=8, ndim=2)

    out = jnp.zeros_like(binary)
    out = out.at[frame_idx].set(big)
    # all-empty stack → all-zero output (reference returns zeros_like)
    return jnp.where(areas[frame_idx] > 0, out, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("threshold", "labels"))
def postprocess_softmax_stack(softmax: jax.Array, threshold: float = 0.5,
                              labels: tuple = (1, 2)) -> jax.Array:
    """Baseline-path postprocess of a (C, N, H, W) softmax stack.

    Soft-threshold, per-pixel argmax over channels, then keep only the
    largest 3-D connected component of each class label.
    """
    sm = jnp.where(softmax < threshold, 0.0, softmax)
    seg = jnp.argmax(sm, axis=0).astype(jnp.uint8)          # (N, H, W)
    out = jnp.zeros_like(seg)
    for lab in labels:
        keep = largest_component(seg == lab, connectivity=6, ndim=3)
        out = jnp.where(keep > 0, jnp.uint8(lab), out)
    return out
