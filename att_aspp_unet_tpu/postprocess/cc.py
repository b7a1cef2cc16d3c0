"""Connected-component labeling on TPU.

The irregular, pointer-chasing union-find of scipy/skimage
(``skimage.measure.label`` in ``refine_mask``, ``scipy.ndimage.label`` in
``model_attention_aspp.py:83``) does not map to a vector machine.  Instead we
use fixed-point **min-label propagation with segmented scans** (SURVEY.md §7
"hard parts" #1):

- every foreground pixel starts with a unique label (its flat index + 1);
- each iteration takes the min over the neighbourhood *and* over whole
  contiguous runs along each axis via segmented ``associative_scan``
  (a run adopts its minimum in one step, so labels cross a component in
  O(#bends) iterations instead of O(diameter));
- a ``lax.while_loop`` stops when no label changes.

Largest-component selection avoids an H·W-bin histogram: labels are sorted
and the longest equal-run is found with a prefix-max scan — O(M log M) on the
VPU with tiny memory, which also scales to labeling full 3-D sweeps
(N·H·W ≈ 3.5·10⁸ voxels) for the nnU-Net-style per-class postprocess
(``postprocess_probability_maps.py:76-77``).

Everything is static-shape; the whole (N, H, W) stack is labeled in one
program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.int32(2 ** 30)


def _segmented_min_scan(values: jax.Array, reset: jax.Array, axis: int,
                        reverse: bool = False) -> jax.Array:
    """Running min along ``axis`` that restarts after every ``reset`` element.

    combine((v1, r1), (v2, r2)) = (v2 if r2 else min(v1, v2), r1 | r2) is
    associative, so ``lax.associative_scan`` evaluates it in O(log n) depth.
    """

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    axis = axis % values.ndim  # associative_scan(reverse=…) needs axis >= 0
    out, _ = jax.lax.associative_scan(combine, (values, reset), axis=axis,
                                      reverse=reverse)
    return out


def _shift(arr: jax.Array, axis: int, delta: int, fill) -> jax.Array:
    out = jnp.roll(arr, delta, axis=axis)
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(0, delta) if delta > 0 else slice(delta, None)
    return out.at[tuple(idx)].set(fill)


def _propagate_step(labels: jax.Array, fg: jax.Array, offsets, scan_axes
                    ) -> jax.Array:
    big = _INF
    m = labels
    for off in offsets:
        s = labels
        for axis, delta in off:
            s = _shift(s, axis, delta, big)
        m = jnp.minimum(m, s)
    m = jnp.where(fg, m, big)

    reset = ~fg
    for axis in scan_axes:
        m = _segmented_min_scan(m, reset, axis=axis)
        m = _segmented_min_scan(m, reset, axis=axis, reverse=True)
    return jnp.where(fg, m, big)


def _conn_offsets(ndim: int, connectivity: int):
    """Neighbourhood offsets as ((axis, delta), ...) tuples.

    2-D: connectivity 4 (cross) or 8 (full) over the last two axes.
    3-D: connectivity 6 (cross) or 26 (full) over the last three axes.
    """
    axes = list(range(-ndim, 0))
    if (ndim == 2 and connectivity == 4) or (ndim == 3 and connectivity == 6):
        return [((a, d),) for a in axes for d in (-1, 1)]
    # full connectivity
    import itertools
    offs = []
    for deltas in itertools.product((-1, 0, 1), repeat=ndim):
        if all(d == 0 for d in deltas):
            continue
        offs.append(tuple((a, d) for a, d in zip(axes, deltas) if d != 0))
    return offs


@functools.partial(jax.jit, static_argnames=("connectivity", "ndim",
                                             "max_iters"))
def label_components(mask: jax.Array, connectivity: int = 8, ndim: int = 2,
                     max_iters: int = 128) -> jax.Array:
    """Label connected components of a boolean array.

    ``ndim=2``: components within each (H, W) plane, leading axes batched
    (skimage ``label`` default 8-connectivity).
    ``ndim=3``: components over the last three axes (frame, H, W).

    Returns int32 labels: 0 = background; each component carries the flat
    index + 1 of its first voxel — unique but not consecutive.
    """
    fg = mask.astype(bool)
    spatial = fg.shape[-ndim:]
    import math
    flat = jnp.arange(1, math.prod(spatial) + 1,
                      dtype=jnp.int32).reshape(spatial)
    labels = jnp.where(fg, jnp.broadcast_to(flat, fg.shape), _INF)

    offsets = _conn_offsets(ndim, connectivity)
    scan_axes = list(range(-ndim, 0))

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        new = _propagate_step(lab, fg, offsets, scan_axes)
        return new, jnp.any(new != lab), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True),
                                                   jnp.int32(0)))
    return jnp.where(fg, labels, 0)


def _largest_run(flat_labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(label, size) of the most frequent non-zero value in a 1-D array,
    via sort + longest-equal-run (prefix-max of run starts)."""
    s = jnp.sort(flat_labels)
    n = s.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(start, idx, -1))
    length = idx - run_start + 1
    length = jnp.where(s > 0, length, 0)
    best = jnp.argmax(length)
    return s[best], length[best]


def component_sizes(labels: jax.Array, ndim: int = 2):
    """(label, size) of the largest component per batch element —
    see ``largest_component`` for the mask-level variant."""
    import math
    spatial = labels.shape[-ndim:]
    lead = labels.shape[:-ndim]
    flat = labels.reshape((-1, math.prod(spatial)))
    lab, size = jax.vmap(_largest_run)(flat)
    return lab.reshape(lead), size.reshape(lead)


@functools.partial(jax.jit, static_argnames=("connectivity", "ndim",
                                             "min_area"))
def largest_component(mask: jax.Array, connectivity: int = 8, ndim: int = 2,
                      min_area: int = 0) -> jax.Array:
    """Keep only the largest connected component of each mask.

    If the largest component has fewer than ``min_area`` pixels the result is
    all-zero — this matches ``refine_mask``'s "drop small, keep largest"
    because keeping every component ≥ min_area and then the largest of those
    equals keeping the global largest iff it is ≥ min_area
    (``attention_aspp_unet_pipeline_stage.py:343-346``).
    """
    labels = label_components(mask, connectivity, ndim)
    best, size = component_sizes(labels, ndim)
    expand = (...,) + (None,) * ndim
    keep = (labels == best[expand]) & (labels > 0)
    ok = (size >= max(min_area, 1))[expand]
    return (keep & ok).astype(jnp.uint8)
