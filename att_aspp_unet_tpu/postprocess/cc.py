"""Connected-component labeling on TPU.

The irregular, pointer-chasing union-find of scipy/skimage
(``skimage.measure.label`` in ``refine_mask``, ``scipy.ndimage.label`` in
``model_attention_aspp.py:83``) does not map to a vector machine.  Instead we
use fixed-point **min-label propagation with segmented scans** (SURVEY.md §7
"hard parts" #1):

- every foreground pixel starts with a unique label (its flat index + 1);
- each iteration takes the min over whole contiguous runs along each axis via
  segmented cumulative scans (a run adopts its minimum in one step, so labels
  cross a component in O(#bends) iterations instead of O(diameter)), plus the
  *diagonal* neighbour mins for 8/26-connectivity — the axis-aligned
  neighbours are already subsumed by the scans (two vertically adjacent
  foreground pixels share a vertical run);
- a ``lax.while_loop`` stops when no label changes.

Two scan lowerings, chosen by value range:

- **encoded** (default for 2-D): a segmented min-scan is a plain cumulative
  *max* of ``run_index·L − value`` where ``run_index`` (cumsum of segment
  resets) is loop-invariant and precomputed.  Along the scan the run index is
  non-decreasing, so the max always lands in the current run and maximising
  ``−value`` minimises the value.  One single-operand ``associative_scan``
  instead of a pair combine — ~4× less HLO per scan step, which is what made
  the original implementation take >15 min through the remote compile service
  at native sweep resolution (NOTES.md round-1);
- **pair** fallback when ``max_run·L`` would overflow int32 (full 3-D sweeps:
  N·H·W labels ≈ 3.5·10⁸).

Largest-component selection avoids an H·W-bin histogram: labels are sorted
and the longest equal-run is found with a prefix-max scan — O(M log M) on the
VPU with tiny memory, which also scales to labeling full 3-D sweeps for the
nnU-Net-style per-class postprocess (``postprocess_probability_maps.py:76-77``).

Everything is static-shape; the whole (N, H, W) stack is labeled in one
program.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = jnp.int32(2 ** 30)


# ---------------------------------------------------------------- scans

def _segmented_min_scan(values: jax.Array, reset: jax.Array, axis: int,
                        reverse: bool = False) -> jax.Array:
    """Running min along ``axis`` that restarts after every ``reset`` element
    (pair-combine fallback; works for any int32 value range).

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


def _run_bases(reset: jax.Array, axis: int) -> Tuple[jax.Array, jax.Array]:
    """Per-direction run indices (cumsum of resets) for the encoded scan.
    Loop-invariant — computed once outside the propagation loop."""
    fwd = jnp.cumsum(reset.astype(jnp.int32), axis=axis)
    rev = jnp.flip(jnp.cumsum(jnp.flip(reset, axis).astype(jnp.int32),
                              axis=axis), axis)
    return fwd, rev


def _segmented_min_scan_enc(values: jax.Array, base: jax.Array, L: int,
                            axis: int, reverse: bool = False) -> jax.Array:
    """Segmented min-scan as one cumulative max of ``base·L − v``.

    Valid when every value of interest is in [0, L) (background may hold
    _INF — its encoding is hugely negative and never wins the max) and
    ``max(base)·L + 2³⁰ < 2³¹``.

    ``lax.cummax`` (not a hand-rolled ``associative_scan``) is load-bearing
    for compile time: on TPU it lowers to a single reduce-window HLO
    instruction, while an explicit associative scan unrolls into ~2·log₂(n)
    slice/pad/max steps *per scan per loop iteration* — that unrolling is
    what made the round-1 refine program take >15 min through the remote
    compile service.
    """
    axis = axis % values.ndim
    enc = base * jnp.int32(L) - values
    enc = jax.lax.cummax(enc, axis=axis, reverse=reverse)
    return base * jnp.int32(L) - enc


# ------------------------------------------------------------ propagation

def _diag_offsets(ndim: int, connectivity: int):
    """Neighbour offsets NOT subsumed by the axis scans: the diagonals.

    4-conn (2-D) / 6-conn (3-D): none — axis runs cover everything.
    8-conn (2-D): the 4 diagonals.  26-conn (3-D): the 20 offsets with ≥2
    non-zero deltas.
    """
    if (ndim == 2 and connectivity == 4) or (ndim == 3 and connectivity == 6):
        return []
    import itertools
    axes = list(range(-ndim, 0))
    offs = []
    for deltas in itertools.product((-1, 0, 1), repeat=ndim):
        if sum(d != 0 for d in deltas) < 2:
            continue
        offs.append(tuple((a, d) for a, d in zip(axes, deltas) if d != 0))
    return offs


def _neighbor_min(labels: jax.Array, offsets, ndim: int) -> jax.Array:
    """Min over ``labels`` and its copies shifted by each offset (out-of-image
    = +inf).  One pad + one slice per offset — compact HLO."""
    if not offsets:
        return labels
    pad = [(0, 0)] * (labels.ndim - ndim) + [(1, 1)] * ndim
    lp = jnp.pad(labels, pad, constant_values=_INF)
    spatial = labels.shape[-ndim:]
    m = labels
    for off in offsets:
        starts = {axis: 1 for axis in range(-ndim, 0)}
        for axis, delta in off:
            # neighbour at p+delta contributes to p → shift by -delta
            starts[axis] = 1 - delta
        idx = [slice(None)] * (labels.ndim - ndim)
        for k, axis in enumerate(range(-ndim, 0)):
            s = starts[axis]
            idx.append(slice(s, s + spatial[k]))
        m = jnp.minimum(m, lp[tuple(idx)])
    return m


def _make_propagate(fg: jax.Array, ndim: int, connectivity: int):
    """Build the per-iteration propagate function.  All loop-invariant
    pieces (diagonal offsets, scan bases, encoding mode) are precomputed so
    the while_loop body stays small."""
    offsets = _diag_offsets(ndim, connectivity)
    scan_axes = list(range(-ndim, 0))
    reset = ~fg

    n_vals = math.prod(fg.shape[-ndim:]) + 2
    L = 1 << max(1, (n_vals - 1).bit_length())
    max_run = max(fg.shape[-ndim:]) + 1
    use_enc = max_run * L + int(_INF) < 2 ** 31 - 1

    if use_enc:
        bases = {axis: _run_bases(reset, axis) for axis in scan_axes}

        def propagate(labels):
            m = _neighbor_min(labels, offsets, ndim)
            m = jnp.where(fg, m, _INF)
            for axis in scan_axes:
                bf, br = bases[axis]
                m = _segmented_min_scan_enc(m, bf, L, axis)
                m = _segmented_min_scan_enc(m, br, L, axis, reverse=True)
            return jnp.where(fg, m, _INF)
    else:
        def propagate(labels):
            m = _neighbor_min(labels, offsets, ndim)
            m = jnp.where(fg, m, _INF)
            for axis in scan_axes:
                m = _segmented_min_scan(m, reset, axis)
                m = _segmented_min_scan(m, reset, axis, reverse=True)
            return jnp.where(fg, m, _INF)

    return propagate


def _fixed_point(propagate, labels, max_iters: int):
    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        new = propagate(lab)
        return new, jnp.any(new != lab), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels


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
    flat = jnp.arange(1, math.prod(spatial) + 1,
                      dtype=jnp.int32).reshape(spatial)
    labels = jnp.where(fg, jnp.broadcast_to(flat, fg.shape), _INF)

    propagate = _make_propagate(fg, ndim, connectivity)
    labels = _fixed_point(propagate, labels, max_iters)
    return jnp.where(fg, labels, 0)


# -------------------------------------------------------- largest component

def _largest_run(flat_labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(label, size) of the most frequent non-zero value in a 1-D array,
    via sort + longest-equal-run (prefix-max of run starts)."""
    s = jnp.sort(flat_labels)
    n = s.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.concatenate([jnp.array([True]), s[1:] != s[:-1]])
    run_start = jax.lax.cummax(jnp.where(start, idx, -1))
    length = idx - run_start + 1
    length = jnp.where(s > 0, length, 0)
    best = jnp.argmax(length)
    return s[best], length[best]


def component_sizes(labels: jax.Array, ndim: int = 2):
    """(label, size) of the largest component per batch element —
    see ``largest_component`` for the mask-level variant."""
    spatial = labels.shape[-ndim:]
    lead = labels.shape[:-ndim]
    flat = labels.reshape((-1, math.prod(spatial)))
    lab, size = jax.vmap(_largest_run)(flat)
    return lab.reshape(lead), size.reshape(lead)


@functools.partial(jax.jit, static_argnames=("connectivity", "ndim"))
def largest_component(mask: jax.Array, connectivity: int = 8, ndim: int = 2,
                      min_area=0) -> jax.Array:
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
    # min_area may be a traced scalar (shape-bucketed refine passes the true
    # image area at runtime)
    ok = (size >= jnp.maximum(jnp.asarray(min_area, size.dtype), 1))[expand]
    return (keep & ok).astype(jnp.uint8)
