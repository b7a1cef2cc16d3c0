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
from .morphology import binary_closing, binary_dilation, binary_erosion, \
    fill_holes, structuring_ellipse


def _refine_core(masks, min_area, valid, close_kernel: int):
    """Shared refine body.  ``min_area`` may be traced; ``valid`` is None
    (true-size input) or a traced (H, W) bool marking the un-padded region."""
    kept = largest_component(masks, connectivity=8, ndim=2, min_area=min_area)
    se = structuring_ellipse(close_kernel)
    if valid is None:
        closed = binary_closing(kept, se)
    else:
        # emulate the true image border inside the bucket: outside the valid
        # region counts as foreground for the erosion, the way cv2's
        # replicated border never erodes the edge
        d = binary_dilation(kept, se)
        d = jnp.where(valid, d, 1)
        closed = binary_erosion(d, se, border_foreground=True)
        closed = jnp.where(valid, closed, 0)
    # closing can only add pixels around the (single) kept component; fill
    # holes to finish.  CC labeling and hole filling are exact under zero
    # padding as-is — pad background merges with true border background.
    filled = fill_holes(closed)
    # empty-input frames stay empty (closing of empty is empty, but guard the
    # degenerate all-background fill)
    any_fg = (kept.sum(axis=(-2, -1), keepdims=True) > 0)
    return jnp.where(any_fg, filled, 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("min_area_px", "min_area_frac",
                                             "close_kernel"))
def refine_mask(masks: jax.Array, min_area_px: int = 20,
                min_area_frac: float = 0.0015,
                close_kernel: int = 7) -> jax.Array:
    """Refine binary masks (..., H, W) — reference ``refine_mask`` semantics."""
    H, W = masks.shape[-2], masks.shape[-1]
    min_area = max(min_area_px, int(min_area_frac * H * W))
    return _refine_core(masks, min_area, None, close_kernel)


@functools.partial(jax.jit, static_argnames=("min_area_px", "min_area_frac",
                                             "close_kernel"))
def _refine_mask_padded(masks, true_hw, min_area_px: int,
                        min_area_frac: float, close_kernel: int):
    """Bucket-shape refine: ``true_hw`` is a traced (2,) int32 — one compile
    serves every true resolution inside the bucket."""
    H, W = masks.shape[-2], masks.shape[-1]
    th, tw = true_hw[0], true_hw[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = (rows < th) & (cols < tw)
    # int() truncation of the reference; areas are positive so floor == trunc
    min_area = jnp.maximum(
        jnp.int32(min_area_px),
        jnp.floor(min_area_frac * th.astype(jnp.float32) *
                  tw.astype(jnp.float32)).astype(jnp.int32))
    return _refine_core(masks, min_area, valid, close_kernel)


def refine_bucket_hw(h: int, w: int, granularity: int = 128):
    """Round (h, w) up to the shape bucket, so every sweep resolution in a
    deployment reuses one compiled refine program (new program shapes cost
    minutes through a remote compile service — NOTES.md)."""
    up = lambda v: ((v + granularity - 1) // granularity) * granularity
    return up(h), up(w)


def refine_mask_bucketed(masks: jax.Array, min_area_px: int = 20,
                         min_area_frac: float = 0.0015,
                         close_kernel: int = 7,
                         granularity: int = 128) -> jax.Array:
    """``refine_mask`` over a zero-padded shape bucket; returns the true-size
    result.  Semantically identical to the unbucketed call (tested); the true
    (H, W) rides in as a runtime operand, so ALL resolutions within a bucket
    share one compiled program."""
    H, W = masks.shape[-2], masks.shape[-1]
    hb, wb = refine_bucket_hw(H, W, granularity)
    # everything routes through the padded program (even exact-bucket inputs)
    # so the compile count stays at one per bucket
    pad = [(0, 0)] * (masks.ndim - 2) + [(0, hb - H), (0, wb - W)]
    padded = jnp.pad(masks, pad)
    out = _refine_mask_padded(padded, jnp.asarray([H, W], jnp.int32),
                              min_area_px, min_area_frac, close_kernel)
    return out[..., :H, :W]


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


def get_binary_masks(softmax_array, threshold: float,
                     class_label: int) -> np.ndarray:
    """Threshold one class channel of a (C, N, H, W) softmax stack to {0, 1}
    (``postprocess_probability_maps.py:8-15``)."""
    return (np.asarray(softmax_array)[class_label] >= threshold
            ).astype(np.uint8)


def get_positive_frames(mask) -> list:
    """Indices of frames with any non-zero pixel
    (``postprocess_probability_maps.py:17-22``) — vectorised."""
    m = np.asarray(mask)
    return np.flatnonzero(m.reshape(m.shape[0], -1).any(axis=1)).tolist()


def merge_annotations(existing_labels: np.ndarray, new_labels: np.ndarray,
                      priority_label=None) -> np.ndarray:
    """Merge two label volumes (``postprocess_probability_maps.py:25-57``).

    Non-overlapping new labels overwrite; overlapping pixels take
    ``priority_label`` if given, else the label with the larger total pixel
    count wins.  Unlike the reference, a 2-D input really is returned 2-D
    (the reference re-checks the shape *after* promoting to 3-D, so its
    "return the 2D result" branch is dead code — intent implemented,
    bug not replicated)."""
    existing = np.asarray(existing_labels)
    new = np.asarray(new_labels)
    was_2d = existing.ndim == 2
    if was_2d:
        existing, new = existing[None], new[None]

    merged = existing.copy()
    merged[new != 0] = new[new != 0]

    overlap = (existing != 0) & (new != 0)
    if overlap.any():
        if priority_label is not None:
            merged[overlap] = priority_label
        else:
            counts = np.bincount(existing.ravel())
            new_counts = np.bincount(new.ravel())
            exist_n = counts[existing[overlap]]
            new_n = new_counts[new[overlap]]
            merged[overlap] = np.where(exist_n >= new_n, existing[overlap],
                                       new[overlap])
    return merged[0] if was_2d else merged


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
