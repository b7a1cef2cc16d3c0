"""Intensity-centroid ROI cropping, batched on device.

Reference ``crop_roi_224`` (``/root/reference/model_attention_aspp.py:20-30``):
threshold at 1.2× the frame mean, take the centroid of the bright pixels
(frame centre if none), and cut a ``roi×roi`` window clamped inside the frame.
The reference looped per frame on host; here the whole sweep is one vmapped
``dynamic_slice`` program, and the paste-back of ROI probability maps is a
vmapped ``dynamic_update_slice``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("roi",))
def crop_roi(frames: jax.Array, roi: int = 224) -> Tuple[jax.Array, jax.Array]:
    """Crop an (N, H, W) stack to (N, roi, roi) around per-frame intensity
    centroids.  Returns (patches, origins) with origins = (N, 2) int32 (y0, x0).

    Frames smaller than ``roi`` are zero-padded bottom/right first (the
    reference's copyMakeBorder fallback).
    """
    N, H, W = frames.shape
    if H < roi or W < roi:
        frames = jnp.pad(frames, ((0, 0), (0, max(0, roi - H)), (0, max(0, roi - W))))
        N, H, W = frames.shape

    def one(img):
        thr = jnp.mean(img) * 1.2
        m = (img > thr).astype(jnp.float32)
        cnt = jnp.sum(m)
        ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        # int(mean) truncates; coords are non-negative so floor == trunc
        cy = jnp.where(cnt > 0, jnp.floor(jnp.sum(ys * m) / jnp.maximum(cnt, 1)),
                       H // 2).astype(jnp.int32)
        cx = jnp.where(cnt > 0, jnp.floor(jnp.sum(xs * m) / jnp.maximum(cnt, 1)),
                       W // 2).astype(jnp.int32)
        y0 = jnp.clip(cy - roi // 2, 0, H - roi)
        x0 = jnp.clip(cx - roi // 2, 0, W - roi)
        patch = jax.lax.dynamic_slice(img, (y0, x0), (roi, roi))
        return patch, jnp.stack([y0, x0])

    return jax.vmap(one)(frames)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def paste_roi_probs(prob_roi: jax.Array, origins: jax.Array,
                    out_hw: Tuple[int, int]) -> jax.Array:
    """Paste (N, roi, roi) probability patches back into zero (N, H, W) maps at
    their per-frame origins (``model_attention_aspp.py:57-60``)."""
    H, W = out_hw
    N, r, _ = prob_roi.shape

    def one(p, org):
        canvas = jnp.zeros((H, W), p.dtype)
        y0 = jnp.clip(org[0], 0, max(H - r, 0))
        x0 = jnp.clip(org[1], 0, max(W - r, 0))
        return jax.lax.dynamic_update_slice(canvas, p[: min(r, H), : min(r, W)],
                                            (y0, x0))

    return jax.vmap(one)(prob_roi, origins)
