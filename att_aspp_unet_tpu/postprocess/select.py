"""Frame selection: max-area pick and top-K area → circularity re-ranking.

Device-side equivalents of:

- ``select_fetal_abdomen_mask_and_frame`` (max-area frame, −1 when empty;
  ``model_attention_aspp.py:91-97`` / ``model.py:107-139``),
- ``select_best`` (top-5 area frames re-ranked by circularity 4πA/P²;
  ``attention_aspp_unet_pipeline_stage.py:350-353``).

The circularity uses an on-device perimeter estimated by Cauchy–Crofton from
exposed unit edges (P ≈ π/4 · #fg/bg transitions) — a smooth, trace-free
stand-in for cv2's traced-contour arc length.  For AC *measurement* the exact
traced perimeter lives in ``measure.contour``; here only the candidate
*ranking* matters.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


def boundary_mask(mask: jax.Array) -> jax.Array:
    """Foreground pixels with at least one 4-neighbour background/edge pixel
    (the pixel set cv2's external contour traces, holes ignored)."""
    m = (mask > 0)
    f = m.astype(jnp.float32)
    lead_pad = [(0, 0)] * (f.ndim - 2)
    fp = jnp.pad(f, lead_pad + [(1, 1), (1, 1)])
    H, W = f.shape[-2], f.shape[-1]

    def sh(dy, dx):
        sl = [slice(None)] * (f.ndim - 2) + [slice(1 + dy, 1 + dy + H),
                                             slice(1 + dx, 1 + dx + W)]
        return fp[tuple(sl)]

    neigh_min = jnp.minimum(jnp.minimum(sh(-1, 0), sh(1, 0)),
                            jnp.minimum(sh(0, -1), sh(0, 1)))
    return (m & (neigh_min == 0)).astype(jnp.uint8)


def perimeter_estimate(mask: jax.Array) -> jax.Array:
    """Crofton perimeter: π/4 × number of exposed unit edges per mask."""
    m = (mask > 0).astype(jnp.float32)
    dh = jnp.abs(jnp.diff(m, axis=-1)).sum(axis=(-2, -1))
    dv = jnp.abs(jnp.diff(m, axis=-2)).sum(axis=(-2, -1))
    edge_h = m[..., :, 0].sum(-1) + m[..., :, -1].sum(-1)
    edge_v = m[..., 0, :].sum(-1) + m[..., -1, :].sum(-1)
    edges = dh + dv + edge_h + edge_v
    return edges * (math.pi / 4.0)


def circularity(mask: jax.Array) -> jax.Array:
    """4πA/P² per mask (0 where empty)."""
    area = (mask > 0).sum(axis=(-2, -1)).astype(jnp.float32)
    per = perimeter_estimate(mask)
    return jnp.where(per > 1e-6, 4.0 * math.pi * area / (per * per), 0.0)


@jax.jit
def select_max_area_frame(masks: jax.Array):
    """(N, H, W) → (mask2d, frame). frame = −1 and a zero mask when the whole
    stack is empty — the contract of ``select_fetal_abdomen_mask_and_frame``."""
    areas = (masks > 0).sum(axis=(-2, -1))
    idx = jnp.argmax(areas)
    empty = areas[idx] == 0
    frame = jnp.where(empty, -1, idx).astype(jnp.int32)
    sel = jnp.where(empty, 0, (masks[idx] > 0)).astype(jnp.uint8)
    return sel, frame


@functools.partial(jax.jit, static_argnames=("topk",))
def select_best_frame(mask_stack: jax.Array, topk: int = 5) -> jax.Array:
    """Top-``topk`` masks by area, winner by *Crofton* circularity; returns
    the frame index (int32).  Fully on-device, used where an approximate
    ranking is acceptable; the deployment path uses
    :func:`select_best_frame_exact` for cv2-parity ranking."""
    areas = (mask_stack > 0).sum(axis=(-2, -1)).astype(jnp.int32)
    k = max(1, min(topk, mask_stack.shape[0]))
    _, top_idx = jax.lax.top_k(areas, k)
    circ = circularity(mask_stack[top_idx])
    return top_idx[jnp.argmax(circ)].astype(jnp.int32)


def select_best_frame_exact(mask_stack, topk: int = 5) -> int:
    """Reference-parity frame selection (``select_best``,
    ``…stage.py:350-353`` / ``test_ablation.py:398-403``): top-``topk`` by
    pixel area, winner by the cv2 traced-contour circularity (shoelace area /
    closed arc length — ``measure.contour.circularity_score``).  Ties keep
    the largest-area candidate, like the reference's ``max`` over the
    descending-area index list.

    Pure host code (tracing is sequential anyway; callers hand it the small
    already-materialised candidate set — the device half of the pipeline is
    ``infer.engine._predict_case_impl``).  The candidate ordering replicates
    ``areas.argsort()[::-1]`` exactly — including its higher-index-first tie
    order — so tied scores resolve to the same frame the reference picks.
    """
    from ..measure.contour import circularity_score

    ms = np.asarray(mask_stack)
    areas = (ms > 0).reshape(ms.shape[0], -1).sum(axis=1)
    k = max(1, min(topk, len(areas)))
    idx = np.argsort(areas)[::-1][:k]
    scores = [circularity_score(ms[i]) for i in idx]
    return int(idx[int(np.argmax(scores))])
