"""Sweep inference engines.

One batched XLA program takes a whole ultrasound sweep from raw frames to
probability maps — the reference's per-frame Python loops (HOT LOOP 1/2 in
SURVEY.md §3.1) collapse into device code:

- ``AttAsppEngine.predict_full``: the standalone predict path
  (``…stage.py:483-498``): enhance → resize 512 → hflip-TTA forward →
  resize back to native → 5×5 Gaussian — for ALL frames at once.
- ``AttAsppEngine.predict_roi``: the deployment ROI path
  (``model_attention_aspp.py:41-65``): linspace-subsample 128 frames,
  intensity-centroid 224² crop, batched forward, paste-back.
- ``BaselineEngine``: the nnU-Net-style path (``model.py:62-89``):
  enhance → sliding-window Gaussian-weighted tiles + mirror TTA → (C, N, H, W)
  softmax probabilities.

Frame batches shard over the mesh's data axis when one is supplied — frames
are independent, so sweep inference is pure data parallelism over ICI.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..measure import measure_ac_mm
from ..models import AttentionASPPUNet, PlainConvUNet, sliding_window_predict
from ..ops.image import gaussian_blur, resize_bilinear, resize_nearest
from ..postprocess import (postprocess_roi_stack, postprocess_softmax_stack,
                           refine_mask, select_best_frame_exact,
                           select_max_area_frame)
from ..preprocess import crop_roi, enhance_frames, paste_roi_probs
from ..preprocess.enhance import preprocess_sweep


@functools.partial(jax.jit, static_argnames=("apply_fn", "hflip"))
def forward_probs_tta(apply_fn: Callable, variables, x: jax.Array,
                      hflip: bool = True) -> jax.Array:
    """(B, S, S, C) → sigmoid probabilities (B, S, S); logits averaged over
    the horizontal-flip TTA pair (``predict_prob_tta``, ``…stage.py:336-338``).

    The original and flipped views run as ONE doubled batch — same FLOPs as
    two sequential calls but a single larger MXU program (better utilisation
    than the reference's two separate forwards)."""

    def logits_of(inp):
        out = apply_fn(variables, inp)
        if isinstance(out, tuple):
            out = out[0]
        return out.astype(jnp.float32)

    if not hflip:
        return jax.nn.sigmoid(logits_of(x))[..., 0]

    B = x.shape[0]
    both = jnp.concatenate([x, jnp.flip(x, axis=2)], axis=0)
    l = logits_of(both)
    l = (l[:B] + jnp.flip(l[B:], axis=2)) / 2.0
    return jax.nn.sigmoid(l)[..., 0]


@functools.partial(jax.jit, static_argnames=("apply_fn", "batch", "hflip"))
def predict_sweep_probs(apply_fn: Callable, variables, frames: jax.Array,
                        batch: int = 8, hflip: bool = True) -> jax.Array:
    """(N, S, S) float frames → (N, S, S) probabilities, micro-batched with
    ``lax.map`` to bound activation memory while keeping one compiled program."""
    N, S1, S2 = frames.shape
    pad = (-N) % batch
    fp = jnp.pad(frames, ((0, pad), (0, 0), (0, 0)))
    nb = (N + pad) // batch
    tiles = fp.reshape(nb, batch, S1, S2)[..., None]

    probs = jax.lax.map(
        lambda t: forward_probs_tta(apply_fn, variables, t, hflip), tiles)
    return probs.reshape(nb * batch, S1, S2)[:N]


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "img_size", "clahe_clip", "clahe_grid", "median_kernel",
    "batch", "tta", "gauss_k"))
def _predict_full_impl(apply_fn, variables, sweep, img_size, clahe_clip,
                       clahe_grid, median_kernel, batch, tta, gauss_k):
    """Whole predict path — enhance → resize → TTA forward → resize back →
    blur — as ONE jitted program (per-op eager dispatch costs ~50 ms each
    through a remote-TPU tunnel; fusing removes all intermediate host syncs)."""
    x = preprocess_sweep(sweep, img_size, clahe_clip, clahe_grid,
                         median_kernel)
    probs = predict_sweep_probs(apply_fn, variables, x, batch, tta)
    native = resize_bilinear(probs, sweep.shape[-2:])
    return gaussian_blur(native, gauss_k, 0.0)


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "img_size", "clahe_clip", "clahe_grid", "median_kernel"))
def _psi_map_impl(apply_fn, variables, frames, img_size, clahe_clip,
                  clahe_grid, median_kernel):
    """(N, H, W) raw frames → (N, H, W) mean attention-ψ map at native
    resolution.

    The reference's ``--viz_att`` predict path (``test_ablation.py:823-828``)
    bilinearly upsamples every gate's ψ to the model input size, means the
    stack, and resizes to the frame; one jitted program here.  Gates that
    are off contribute nothing; with no gates at all the map is zero.
    """
    x = preprocess_sweep(frames, img_size, clahe_clip, clahe_grid,
                         median_kernel)[..., None]
    out = apply_fn(variables, x)
    psis = out[1] if isinstance(out, tuple) else []
    maps = [resize_bilinear(p[..., 0].astype(jnp.float32),
                            (img_size, img_size))
            for p in psis if p is not None]
    if maps:
        psi = sum(maps) / len(maps)
    else:
        psi = jnp.zeros((frames.shape[0], img_size, img_size), jnp.float32)
    return resize_bilinear(psi, frames.shape[-2:])


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "img_size", "clahe_clip", "clahe_grid", "median_kernel"))
def _quant_calib_impl(apply_fn, variables, frames, img_size, clahe_clip,
                      clahe_grid, median_kernel):
    """One preprocessed forward in ``int8_calib`` lowering; returns the
    recorded per-conv-site activation absmax tree (collection ``quant``,
    see ``nn/quant.py``)."""
    x = preprocess_sweep(frames, img_size, clahe_clip, clahe_grid,
                         median_kernel)[..., None]
    _, updated = apply_fn(variables, x)
    return updated["quant"]


def candidate_rank_areas(binary: jax.Array,
                         close_kernel: int = 7,
                         fill_proxy: bool = True) -> jax.Array:
    """(N, H, W) 0/1 → (N,) rank key ≈ the area each frame would have AFTER
    refinement, in raw-pixel units.

    The reference refines EVERY frame and selects top-k by refined area
    (``…stage.py:490-503``); raw thresholded area can underestimate it
    without bound when refinement ADDS area.  Two upward moves exist, and
    the key models both with the same operators refinement itself uses:

    - the ``close_kernel`` morphological close is applied at FULL resolution
      to every frame (two reduce-window passes — cheap next to the
      forward).  This is exact for the close's effects: dense dot/dither
      patterns (probability plateaus at the threshold) solidify to their
      true closed extent, while genuinely sparse speckle — gaps wider than
      the kernel — is left at its raw count, never inflated (round-2
      advisor finding);
    - hole filling is estimated on the 4×4-pooled closed mask (fill is the
      expensive propagation, and a ring's interior only needs cell
      precision): + 16 px per quarter-res cell the fill adds, so an
      abdomen rim ranks with its interior counted.

    Upward error vs the true refined area is bounded (≤16 px per partial
    boundary cell of a filled region, plus components the refine's
    largest-CC-only step would drop) and errs toward KEEPING frames in the
    candidate set; ``PredictConfig.refine_margin`` absorbs it.  Selection
    among the candidates is exact (fully refined masks, cv2-parity
    re-rank).

    ``fill_proxy=False`` drops the pooled hole-fill term (closed area
    only) — a measured opt-out for the cascade's scout tier where only a
    coarse ordering is needed (``PredictConfig.cascade_scout_rank``).
    Standalone programs priced the fill at ~73 % of the key (probe r28),
    but fused into the real cascade it costs ~1 % (probe r29), so
    "refined" stays the default.  Tier-2/direct ranking always keeps the
    proxy.
    """
    from ..postprocess.morphology import (binary_closing, fill_holes,
                                          structuring_ellipse)

    closed = binary_closing(binary, structuring_ellipse(close_kernel))
    closed_raw = closed.sum(axis=(-2, -1), dtype=jnp.int32)
    if not fill_proxy:
        return closed_raw
    pooled = jax.lax.reduce_window(closed, np.uint8(0), jax.lax.max,
                                   (1, 4, 4), (1, 4, 4), "SAME")
    cells = pooled.sum(axis=(-2, -1), dtype=jnp.int32)
    filled = fill_holes(pooled).sum(axis=(-2, -1), dtype=jnp.int32)
    return closed_raw + 16 * (filled - cells)


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "img_size", "clahe_clip", "clahe_grid",
    "median_kernel", "batch", "tta", "gauss_k", "threshold", "n_cand",
    "min_area_px", "min_area_frac", "close_kernel", "bucket_hw"))
def _predict_case_impl(apply_fn, variables, sweep, n_valid, img_size,
                       clahe_clip, clahe_grid, median_kernel, batch, tta,
                       gauss_k, threshold, n_cand, min_area_px,
                       min_area_frac, close_kernel, bucket_hw):
    """The WHOLE device side of predict_case as one program: enhance →
    forward → resize-back → blur → threshold → top-M candidate pick →
    bucket-padded refine.  One dispatch instead of four — per-dispatch
    latency through the axon tunnel is ~50 ms, so collapsing round trips is
    worth ~0.15 s per sweep (CLAUDE.md hard rule: everything hot under ONE
    jit)."""
    from ..postprocess.refine import _refine_mask_padded

    probs = _predict_full_impl(apply_fn, variables, sweep, img_size,
                               clahe_clip, clahe_grid, median_kernel, batch,
                               tta, gauss_k)
    binary = (probs > threshold).astype(jnp.uint8)
    n = binary.shape[0]
    areas = candidate_rank_areas(binary, close_kernel)
    # reference candidate order = np.argsort(areas)[::-1]: descending area,
    # higher frame index first on ties — lexsort primary -areas, secondary
    # -idx (overflow-free for any frame size, unlike a composite int key).
    idx = jnp.arange(n, dtype=jnp.int32)
    # mesh staging may have appended all-background pad frames; rank them
    # strictly below every real frame (a padded index must never win)
    areas = jnp.where(idx < n_valid, areas, -1)
    order = jnp.lexsort((-idx, -areas))
    cand_idx = order[:n_cand]
    cand = binary[cand_idx]
    H, W = binary.shape[-2], binary.shape[-1]
    hb, wb = bucket_hw
    padded = jnp.pad(cand, ((0, 0), (0, hb - H), (0, wb - W)))
    refined = _refine_mask_padded(padded, jnp.asarray([H, W], jnp.int32),
                                  min_area_px, min_area_frac, close_kernel)
    # bit-pack the candidate masks along W before they leave the device: the
    # axon tunnel moves ~3.3 MB of uint8 masks in ~0.3 s (it dominated the
    # measured e2e, probe r10); 8× fewer bytes is ~8× less transfer time.
    # np.unpackbits-compatible: byte j holds columns 8j..8j+7, MSB first.
    return cand_idx, _packbits_w(refined[..., :H, :W])


def _cascade_candidates(apply_fn, variables, sweeps, n_valid, img_size,
                        low_size, clahe_clip, clahe_grid, median_kernel,
                        batch, tta, gauss_k, threshold, n_scout, n_cand,
                        min_area_px, min_area_frac, close_kernel, bucket_hw,
                        lowres_enhance: bool = False,
                        scout_batch: int = 0,
                        scout_apply_fn=None,
                        scout_variables=None,
                        scout_thr: float = 0.0,
                        scout_clip: Optional[float] = None,
                        scout_rank: str = "refined"):
    """Two-tier cascade over an (S, N, H, W) stack of S independent
    same-shape sweeps — THE single implementation behind both
    :func:`_predict_case_cascade_impl` (S=1) and
    :func:`_predict_bulk_cascade_impl`, traced inside each wrapper's jit.

    Tier 1 scouts ALL S·N frames at ``low_size`` (1/4 the FLOPs at the
    default half resolution) in one forward; promotion picks the
    ``n_scout`` best-ranked frames PER SWEEP (the reference's unit of
    selection is the sweep, ``analyze_ac.py:19``); tier 2 forwards the
    S·n_scout promoted frames at full ``img_size`` in shared
    micro-batches and ranks / refines / selects exactly as the direct
    path does.  The forward is ~80 % of the direct path's device time
    and candidate selection only ever consults the top ``n_cand ≪ N``
    frames, so paying full resolution for every frame buys nothing the
    scout margin doesn't keep.  Enhancement (CLAHE + median) runs ONCE
    at native resolution and feeds both tiers — semantics preserved
    (the reference enhances before its resize, ``…stage.py:492-494``).
    Scouting never uses TTA; the promoted frames honour the configured
    ``tta``.  All S·n_cand candidates refine in ONE bucketed call,
    amortizing the latency-bound propagation across sweeps.

    ``lowres_enhance`` moves the scout tier's enhancement to ``low_size``
    too (CLAHE + median cost scales with pixels; native-res CLAHE over
    every frame is the next-largest device cost after the forwards) and
    enhances only the PROMOTED frames at native resolution.  Enhancement
    is per-frame, so ``enhance(sweep[promoted]) == enhance(sweep)[promoted]``
    — tier 2 is bit-identical to the direct path either way, and the
    all-frames-promote exactness property is preserved by construction.
    Only the scout RANKING sees differently-adapted CLAHE tiles (fidelity
    measured: probe r23, NOTES.md).

    ``scout_apply_fn``/``scout_variables``/``scout_thr`` optionally give
    the scout tier its OWN (smaller, distilled) model — the scout only
    has to rank frames, not segment them well, and the full-capacity
    scout forward dominates the case's device time (probe r25: ~62 %).
    Tier 2 always runs the main model on the promoted frames, so the
    all-frames-promote exactness property holds for ANY scout model.
    Defaults (None) fall back to the main model and threshold.

    ``scout_clip`` (default: ``clahe_clip``) is the tier-1 CLAHE clip —
    ``<= 0`` skips CLAHE in the scout preprocessing (requires
    ``lowres_enhance`` and a scout trained on unequalised input).
    ``scout_rank="closed"`` ranks tier 1 by closed area only (no pooled
    hole-fill proxy).  Both are tier-1-only diets: tier 2's enhancement,
    ranking, refinement and selection are unchanged, so the served mask
    for any promoted frame is bit-identical to the direct path's.

    Returns per-sweep ``(cand_idx (S, n_cand), packed (S, n_cand, H, Wb))``.
    """
    from ..postprocess.refine import _refine_mask_padded

    if scout_apply_fn is None:
        scout_apply_fn, scout_variables = apply_fn, variables
    if not scout_thr:
        scout_thr = threshold
    if scout_clip is not None and scout_clip <= 0 and not lowres_enhance:
        # trace-time guard: without lowres_enhance tier 1 SHARES tier 2's
        # natively CLAHE-enhanced frames, so a no-CLAHE scout would rank
        # input it was never trained on — the silent tier-1 corruption
        # _init_scout's auto-adoption exists to prevent.  Fail loud.
        raise ValueError(
            "a no-CLAHE scout (scout_clip<=0) requires "
            "cascade_lowres_enhance=True: without it the scout tier shares "
            "the natively CLAHE-enhanced frames and would rank "
            "off-distribution input")
    if scout_clip is None or not lowres_enhance:
        # tier 1 without lowres_enhance SHARES tier 2's natively enhanced
        # frames — a divergent scout preprocessing would force a second
        # native-res enhancement pass, defeating the diet
        scout_clip = clahe_clip
    S, N = sweeps.shape[0], sweeps.shape[1]
    H, W = sweeps.shape[-2], sweeps.shape[-1]
    flat = sweeps.reshape(S * N, H, W)
    idx = jnp.arange(N, dtype=jnp.int32)

    # ---- tier 1: low-res scout over every frame of every sweep ----
    if lowres_enhance:
        lo_u8 = enhance_frames(
            resize_bilinear(flat.astype(jnp.float32), (low_size, low_size)),
            scout_clip, clahe_grid, median_kernel)
        x_lo = lo_u8.astype(jnp.float32) / 255.0
    else:
        u8 = enhance_frames(flat, clahe_clip, clahe_grid, median_kernel)
        xf = u8.astype(jnp.float32)
        x_lo = resize_bilinear(xf, (low_size, low_size)) / 255.0
    probs_lo = predict_sweep_probs(scout_apply_fn, scout_variables, x_lo,
                                   scout_batch or batch, hflip=False)
    binary_lo = (probs_lo > scout_thr).astype(jnp.uint8)
    areas_lo = candidate_rank_areas(
        binary_lo, close_kernel,
        fill_proxy=(scout_rank != "closed")).reshape(S, N)
    areas_lo = jnp.where(idx[None, :] < n_valid, areas_lo, -1)
    order_lo = jax.vmap(lambda a: jnp.lexsort((-idx, -a)))(areas_lo)
    scout_idx = order_lo[:, :n_scout]                      # (S, n_scout)
    flat_idx = (jnp.arange(S, dtype=jnp.int32)[:, None] * N
                + scout_idx).reshape(-1)

    # ---- tier 2: full-res forward on the promoted frames of every sweep ----
    if lowres_enhance:
        hi_u8 = enhance_frames(flat[flat_idx], clahe_clip, clahe_grid,
                               median_kernel)
        xf_hi = hi_u8.astype(jnp.float32)
    else:
        xf_hi = xf[flat_idx]
    x_hi = resize_bilinear(xf_hi, (img_size, img_size)) / 255.0
    probs_hi = predict_sweep_probs(apply_fn, variables, x_hi, batch, tta)
    native = resize_bilinear(probs_hi, (H, W))
    probs = gaussian_blur(native, gauss_k, 0.0)
    binary = (probs > threshold).astype(jnp.uint8)
    areas = candidate_rank_areas(binary, close_kernel).reshape(S, n_scout)
    areas = jnp.where(scout_idx < n_valid, areas, -1)
    # reference tie-break: equal areas prefer the higher ORIGINAL index
    order = jax.vmap(lambda a, si: jnp.lexsort((-si, -a)))(areas, scout_idx)
    local = order[:, :n_cand]                              # (S, n_cand)
    cand_idx = jnp.take_along_axis(scout_idx, local, axis=1)
    cand = jnp.take_along_axis(
        binary.reshape(S, n_scout, H, W), local[..., None, None], axis=1)
    flat_cand = cand.reshape(S * n_cand, H, W)
    hb, wb = bucket_hw
    padded = jnp.pad(flat_cand, ((0, 0), (0, hb - H), (0, wb - W)))
    refined = _refine_mask_padded(padded, jnp.asarray([H, W], jnp.int32),
                                  min_area_px, min_area_frac, close_kernel)
    packed = _packbits_w(refined[..., :H, :W])
    return cand_idx, packed.reshape((S, n_cand) + packed.shape[-2:])


_CASCADE_STATIC_ARGNAMES = (
    "apply_fn", "img_size", "low_size", "clahe_clip", "clahe_grid",
    "median_kernel", "batch", "tta", "gauss_k", "threshold", "n_scout",
    "n_cand", "min_area_px", "min_area_frac", "close_kernel", "bucket_hw",
    "lowres_enhance", "scout_batch", "scout_apply_fn", "scout_thr",
    "scout_clip", "scout_rank")


@functools.partial(jax.jit, static_argnames=_CASCADE_STATIC_ARGNAMES)
def _predict_case_cascade_impl(apply_fn, variables, sweep, n_valid, img_size,
                               low_size, clahe_clip, clahe_grid,
                               median_kernel, batch, tta, gauss_k, threshold,
                               n_scout, n_cand, min_area_px, min_area_frac,
                               close_kernel, bucket_hw,
                               lowres_enhance: bool = False,
                               scout_batch: int = 0,
                               scout_apply_fn=None,
                               scout_variables=None,
                               scout_thr: float = 0.0,
                               scout_clip: Optional[float] = None,
                               scout_rank: str = "refined"):
    """Two-tier predict_case — the S=1 slice of :func:`_cascade_candidates`
    (single source of truth for the tiers and the six scout knobs; the
    leading singleton axis is added/removed inside the jit, so it is one
    device program with no extra dispatches)."""
    cand_idx, packed = _cascade_candidates(
        apply_fn, variables, sweep[None], n_valid, img_size, low_size,
        clahe_clip, clahe_grid, median_kernel, batch, tta, gauss_k,
        threshold, n_scout, n_cand, min_area_px, min_area_frac,
        close_kernel, bucket_hw, lowres_enhance, scout_batch,
        scout_apply_fn, scout_variables, scout_thr, scout_clip, scout_rank)
    return cand_idx[0], packed[0]


@functools.partial(jax.jit, static_argnames=_CASCADE_STATIC_ARGNAMES)
def _predict_bulk_cascade_impl(apply_fn, variables, sweeps, n_valid,
                               img_size, low_size, clahe_clip, clahe_grid,
                               median_kernel, batch, tta, gauss_k, threshold,
                               n_scout, n_cand, min_area_px, min_area_frac,
                               close_kernel, bucket_hw,
                               lowres_enhance: bool = False,
                               scout_batch: int = 0,
                               scout_apply_fn=None,
                               scout_variables=None,
                               scout_thr: float = 0.0,
                               scout_clip: Optional[float] = None,
                               scout_rank: str = "refined"):
    """BULK cascade: S independent sweeps → per-sweep candidates, one
    device program (:func:`_cascade_candidates` verbatim).

    The lean single-case cascade pays a ~76 ms n-independent fixed block
    per call (tier-2 micro-batch + latency-bound refine + glue — probes
    r33/r34); serving S sweeps one call at a time pays it S times.  Here
    the scout scans all S·N frames in one forward, tier 2 forwards the
    S·n_scout promoted frames in shared micro-batches, and all
    candidates refine in ONE bucketed call.  Per sweep the math is
    identical to ``_predict_case_cascade_impl`` — both are the same
    traced body — so a bulk call and S single calls pick the same frames
    and produce the same masks (tested exactly on CPU).  One compile per
    (S, N, H, W) shape: callers batch fixed-size groups
    (``AttAsppEngine.predict_bulk_submit``)."""
    return _cascade_candidates(
        apply_fn, variables, sweeps, n_valid, img_size, low_size,
        clahe_clip, clahe_grid, median_kernel, batch, tta, gauss_k,
        threshold, n_scout, n_cand, min_area_px, min_area_frac,
        close_kernel, bucket_hw, lowres_enhance, scout_batch,
        scout_apply_fn, scout_variables, scout_thr, scout_clip, scout_rank)


def scout_micro_batch(n: int, requested: int, frame_batch: int) -> int:
    """Effective scout-tier micro-batch for an ``n``-frame stack.

    Large batches fill the MXU better at the scout resolution (probe
    r24/r24b: ×1.22–1.41 on the 840-frame case going 16 → 128), but
    ``predict_sweep_probs`` zero-pads the stack to a batch multiple, and a
    batch comparable to ``n`` can waste a large fraction of the scout
    forward on padding (140 frames at batch 128 would scout 83 % extra).
    Halve the requested batch until the padding stays under n/4 — at
    worst down to ``frame_batch``, the tier-2 micro-batch.
    """
    b = max(1, requested or frame_batch)
    while b > frame_batch and (-n) % b > n // 4:
        b //= 2
    return max(1, min(b, max(n, 1)))


def _packbits_w(m: jax.Array) -> jax.Array:
    """(…, W) uint8 0/1 → (…, ceil(W/8)) uint8, np.unpackbits bit order."""
    W = m.shape[-1]
    Wp = ((W + 7) // 8) * 8
    if Wp != W:
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, Wp - W)])
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    grouped = m.reshape(*m.shape[:-1], Wp // 8, 8)
    return jnp.sum(grouped * weights, axis=-1, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "clahe_clip", "clahe_grid", "median_kernel", "roi", "batch"))
def _predict_roi_impl(apply_fn, variables, frames, clahe_clip,
                      clahe_grid, median_kernel, roi, batch):
    """ROI path on (already linspace-subsampled) frames.  Enhancement is
    per-frame, so enhancing the subsample equals subsampling the enhanced
    sweep (the reference's order, ``inference.py:173-177`` →
    ``model_attention_aspp.py:45``) at 1/6th the cost — and the frame axis
    shards cleanly over the mesh."""
    enhanced = enhance_frames(frames, clahe_clip, clahe_grid, median_kernel)
    vol = enhanced.astype(jnp.float32) / 255.0
    patches, origins = crop_roi(vol, roi)
    probs_roi = predict_sweep_probs(apply_fn, variables, patches, batch,
                                    hflip=False)
    return paste_roi_probs(probs_roi, origins, vol.shape[-2:])


def stage_frames(mesh, frames, batch: int):
    """Pad the frame axis to a multiple of (mesh data size × batch) and
    device-put with the data-axis sharding; returns (array, n_pad).
    ``mesh=None`` → plain device array, no padding."""
    if mesh is None:
        return jnp.asarray(frames), 0
    from ..parallel.mesh import batch_sharding
    d = mesh.shape[mesh.axis_names[0]]
    n = frames.shape[0]
    pad = (-n) % (d * batch)
    arr = np.asarray(frames)
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:],
                                            arr.dtype)])
    return jax.device_put(arr, batch_sharding(mesh, arr.ndim)), pad


class AttAsppEngine:
    """Attention-ASPP-UNet inference over full sweeps or single frames.

    With a ``mesh``, the frame axis of the sweep shards over the mesh's data
    axis: frames are independent, so sweep inference is pure data parallelism
    over ICI — the ≥500-frames/s scaling story of SURVEY.md §2.  Without a
    mesh everything runs on the default device.
    """

    def __init__(self, cfg: Config, variables: dict,
                 model: Optional[AttentionASPPUNet] = None, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        c1p = getattr(cfg.model, "c1_pad", 0)
        if c1p and (variables["params"]["d1_0"]["conv"]["kernel"].shape[-1]
                    != c1p):
            # direct-layout checkpoint served under the channel-padded
            # lowering: zero-pad once at construction (nn/cpad.py) —
            # numerically the identity on the real channels
            from ..nn.cpad import pad_variables_c1
            variables = pad_variables_c1(variables, cfg.model.base_c, c1p)
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        if mesh is not None:
            from ..parallel.mesh import replicate
            self.variables = jax.device_put(self.variables, replicate(mesh))
        else:
            # Pin the params on device once.  Host-numpy variables (e.g. an
            # ``npz_weights`` checkpoint) would otherwise re-upload the whole
            # tree on EVERY dispatch — ~2 s/call through the axon tunnel for
            # the base_c-48 flagship (probe r15's 5× "trained-weights
            # regression" was exactly this, not a content effect).
            self.variables = jax.device_put(self.variables)
        self.model = model or AttentionASPPUNet.from_config(cfg.model)
        self._apply = functools.partial(self.model.apply, train=False)
        # Stable reference to the flax apply partial for paths that bypass
        # whatever _maybe_enable_fast_forward swaps into self._apply.
        # psi_sweep passes it as a STATIC jit arg — a fresh partial per call
        # would be a cache miss and a full remote recompile per image.
        self._flax_apply = self._apply
        self._nval_cache: Dict[int, jax.Array] = {}
        # AOT-deserialized executables, memoized per fingerprint (None =
        # looked up and missed → jit path; utils/aot_cache)
        self._aot_loaded: Dict[str, object] = {}
        # memoized fingerprints: the full variables-tree flatten + JSON +
        # sha256 costs host time on every ~76 ms serving submit otherwise;
        # invalidated wherever self.variables is reassigned
        self._aot_key_cache: Dict[tuple, str] = {}
        self._init_scout(cfg, mesh)
        if self.model.conv_lowering == "int8" and "quant" in variables:
            # caller supplied pre-calibrated activation scales; match the
            # params/batch_stats sharding or the first jitted dispatch sees
            # incompatible devices under a mesh
            if mesh is not None:
                from ..parallel.mesh import replicate
                self.variables["quant"] = jax.device_put(
                    variables["quant"], replicate(mesh))
            else:
                self.variables["quant"] = jax.device_put(variables["quant"])
            self._prequantize_int8()
        self._maybe_enable_fast_forward()

    def _init_scout(self, cfg: Config, mesh) -> None:
        """Load the optional DISTILLED SCOUT for cascade serving.

        ``PredictConfig.cascade_scout_weights`` names an ``npz_weights``
        checkpoint of a smaller AttentionASPPUNet (base_c
        ``cascade_scout_base_c``) that replaces the full-capacity model in
        the cascade's tier-1 ranking forward only — tier 2 (the forward
        that produces the served masks) always runs the main model, so
        correctness of the served output never depends on scout quality;
        only WHICH frames get promoted does (fidelity: probe r26).
        """
        self._scout_apply = None
        self._scout_variables = None
        self._scout_clahe = True
        self._scout_img_size = None
        pc = cfg.predict
        self._scout_thr = float(getattr(pc, "cascade_scout_thr", 0.0) or 0.0)
        path = getattr(pc, "cascade_scout_weights", None)
        flag = getattr(pc, "cascade_scout_clahe", None)
        if flag is not None:
            self._scout_clahe = bool(flag)
        if not (getattr(pc, "cascade", False) and path):
            return
        # AUTO from the summary.json next to the weights: a scout trained
        # with --no-clahe records use_clahe=false (serving it through
        # CLAHE input it never saw would corrupt tier-1 ranking silently),
        # its training img_size pins the tier-1 resolution — running
        # a scout at an alien resolution is exactly the off-distribution
        # failure that sank the scout-192 experiment (NOTES.md r21/r31) —
        # and its base_c pins the scout architecture (a width mismatch is
        # a hard shape error at load, so auto-adoption can never serve
        # the wrong net silently).  ``cli train --export_npz`` writes all
        # three next to the weights.
        summary = Path(path).parent / "summary.json"
        meta = {}
        if summary.exists():
            try:
                meta = json.loads(summary.read_text())
            except (ValueError, OSError):
                meta = {}
            if flag is None:
                self._scout_clahe = bool(meta.get("use_clahe", True))
            if meta.get("img_size"):
                self._scout_img_size = int(meta["img_size"])
        if not self._scout_thr:
            # AUTO-ADOPT the scout's own calibrated threshold: tier-1 rank
            # masks are thresholded on the SCOUT's probability distribution,
            # not the main model's — every fidelity probe (r26/r29/r31/r32)
            # ran with the scout's thr.json value, and bench.py loads it
            # explicitly; the CLI engine must match.  The scout tier never
            # uses TTA, so the no-TTA calibration is the right key.
            thr_src = {}
            tj = Path(path).parent / "thr.json"
            if tj.exists():
                try:
                    thr_src = json.loads(tj.read_text())
                except (ValueError, OSError):
                    thr_src = {}
            # pick the SOURCE first (thr.json wins if it holds either key,
            # summary.json is the fallback), THEN the key preference within
            # that source — merging per key would let a summary.json
            # best_thr_no_tta outrank a thr.json that records only best_thr,
            # inverting the documented precedence
            src = thr_src if any(thr_src.get(k) for k in
                                 ("best_thr_no_tta", "best_thr")) else meta
            for key in ("best_thr_no_tta", "best_thr"):
                if src.get(key):
                    self._scout_thr = float(src[key])
                    break
        scout_base_c = getattr(pc, "cascade_scout_base_c", None)
        if scout_base_c is None:
            scout_base_c = int(meta.get("base_c", 16))
        import dataclasses as _dc

        from ..utils.npz_weights import load_npz_variables

        # the scout is its own checkpointed net: never inherit the main
        # model's lowering knobs (a c1_pad meant for the base_c-48 tier-2
        # net would demand padded scout weights that don't exist)
        scout_model = AttentionASPPUNet.from_config(_dc.replace(
            cfg.model, base_c=scout_base_c,
            conv_lowering="direct", c1_pad=0))
        raw = load_npz_variables(path)
        sv = {"params": raw["params"],
              "batch_stats": raw.get("batch_stats", {})}
        if mesh is not None:
            from ..parallel.mesh import replicate
            sv = jax.device_put(sv, replicate(mesh))
        else:
            sv = jax.device_put(sv)
        self._scout_variables = sv
        self._scout_apply = functools.partial(scout_model.apply, train=False)

    def _ensure_quant(self, sweep: np.ndarray) -> None:
        """Lazy PTQ activation calibration (``conv_lowering="int8"``).

        Records per-conv absmax over ``quant_calib_frames`` evenly spaced
        frames of the first sweep this engine sees (one extra dispatch per
        engine lifetime), then serves every sweep through the int8 MXU
        path.  Callers wanting reproducible scales across runs pass a
        ``quant`` collection to ``__init__`` instead."""
        if self.model.conv_lowering != "int8" or "quant" in self.variables:
            return
        p = self.cfg.preprocess
        k = min(getattr(self.cfg.predict, "quant_calib_frames", 16),
                sweep.shape[0])
        idx = np.linspace(0, sweep.shape[0] - 1, k).astype(int)
        # gather the calibration frames where the sweep lives — a device
        # sweep must not round-trip through the host (~58 MB tunnel pull)
        frames = (sweep[idx] if isinstance(sweep, np.ndarray)
                  else jnp.asarray(sweep)[jnp.asarray(idx)])
        calib_model = self.model.clone(conv_lowering="int8_calib")
        calib_apply = functools.partial(calib_model.apply, train=False,
                                        mutable=["quant"])
        calib_vars = {k2: v for k2, v in self.variables.items()
                      if k2 in ("params", "batch_stats")}
        quant = _quant_calib_impl(
            calib_apply, calib_vars, frames,
            p.img_size, p.clahe_clip, p.clahe_grid, p.median_kernel)
        self.variables = dict(self.variables)
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            self.variables["quant"] = jax.device_put(
                quant, replicate(self.mesh))
        else:
            self.variables["quant"] = jax.device_put(quant)
        self._aot_key_cache.clear()
        self._prequantize_int8()

    def _prequantize_int8(self) -> None:
        """Quantize every Conv3x3 kernel OUTSIDE jit once activation scales
        exist (``nn/quant.py::prequantize_params``) — bit-identical to the
        in-graph quantization (``test_prequantized_kernels_bit_identical``)
        but done once per engine instead of inside every dispatch."""
        from ..nn.quant import merge_quant, prequantize_params

        # idempotent: a reloaded archive of a prequantized engine already
        # carries int8 kernels + their w_scale leaves — requantizing the
        # quantized integers would destroy the original scales
        if any(getattr(l, "dtype", None) == jnp.int8
               for l in jax.tree_util.tree_leaves(self.variables["params"])):
            return
        # one jitted device program (a device_get/put round trip would pull
        # the full param tree through the tunnel; eager per-site jnp ops
        # would pay ~50 ms dispatch latency per conv site)
        params_q, ws = jax.jit(prequantize_params)(self.variables["params"])
        new_vars = dict(self.variables)
        new_vars["params"] = params_q
        new_vars["quant"] = merge_quant(dict(self.variables["quant"]), ws)
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            new_vars = jax.device_put(new_vars, replicate(self.mesh))
        self.variables = new_vars
        self._aot_key_cache.clear()

    def _maybe_enable_fast_forward(self):
        """Swap in the packed BN-folded forward (fused Pallas conv pairs,
        ``infer/fast_forward.py``) when it covers this config.

        ``auto`` enables it only for single-device TPU runs: on CPU the
        Pallas kernels would need interpret mode, and under a multi-device
        mesh the pallas_call would have to be shard_mapped — both stay on
        the flax path.
        """
        if self.model.conv_lowering in ("int8", "int8_calib", "w2d_stage"):
            return  # the packed plan has no quantized/width-packed path
        mode = getattr(self.cfg.predict, "fast_forward", "auto")
        if mode == "auto":
            n_mesh = 1 if self.mesh is None else self.mesh.size
            enable = jax.default_backend() == "tpu" and n_mesh == 1
        else:
            enable = bool(mode)
        if not enable:
            return
        from . import fast_forward as _ff
        if not (_ff.supports(self.model) and self.variables["batch_stats"]):
            return
        # keep the flax-layout tree for paths that bypass the packed plan
        # (psi_sweep's diagnostic forward)
        self._flax_variables = self.variables
        plan = _ff.pack_variables(self.model, self.variables)
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            plan = jax.device_put(plan, replicate(self.mesh))
        self.variables = plan
        self._aot_key_cache.clear()
        # forcing the fast path on CPU (tests) runs the Pallas pairs in
        # interpret mode
        self._apply = _ff.make_fast_apply(
            self.model, interpret=jax.default_backend() == "cpu")

    def _stage_frames(self, frames: jax.Array):
        """Shard (pad) the frame axis over the mesh; returns (array, n_pad)."""
        return stage_frames(self.mesh, frames, self.cfg.predict.frame_batch)

    # ---------------- full-frame (predict CLI) path ----------------

    def predict_full(self, sweep: np.ndarray) -> jax.Array:
        """Raw (N, H, W) sweep → (N, H, W) float32 probabilities at native
        resolution (blurred, ready for thresholding).

        Note: ``PredictConfig.tta_hflip`` defaults to False (deployment
        config; the reference predict/calibrate path ran hflip TTA,
        ``…stage.py:336-338``).  Callers wanting reference-parity output
        must pass a config with ``predict.tta_hflip=True``; the predict
        CLI does this itself."""
        p = self.cfg.preprocess
        self._ensure_quant(sweep)
        staged, pad = self._stage_frames(sweep)
        out = _predict_full_impl(
            self._apply, self.variables, staged, p.img_size,
            p.clahe_clip, p.clahe_grid, p.median_kernel,
            self.cfg.predict.frame_batch, self.cfg.predict.tta_hflip,
            self.cfg.predict.gaussian_kernel)
        return out[: out.shape[0] - pad] if pad else out

    def psi_sweep(self, sweep: np.ndarray) -> np.ndarray:
        """(N, H, W) raw frames → (N, H, W) mean attention-ψ maps (the
        ``--viz_att`` diagnostic, reference ``test_ablation.py:823-828``).

        Uses the flax forward directly (the packed ``fast_forward`` plan
        does not thread ψ), so it works for any lowering the model's
        ``apply`` supports."""
        p = self.cfg.preprocess
        self._ensure_quant(sweep)
        flax_vars = getattr(self, "_flax_variables", self.variables)
        out = _psi_map_impl(
            self._flax_apply,
            flax_vars, jnp.asarray(sweep), p.img_size,
            p.clahe_clip, p.clahe_grid, p.median_kernel)
        return np.asarray(out)

    def refine(self, probs: jax.Array, threshold: Optional[float] = None
               ) -> jax.Array:
        thr = self.cfg.predict.threshold if threshold is None else threshold
        pc = self.cfg.predict
        binary = (probs > thr).astype(jnp.uint8)
        return refine_mask(binary, pc.min_area_px, pc.min_area_frac,
                           pc.close_kernel)

    def select_best(self, masks: jax.Array) -> int:
        """cv2-parity top-K area → exact traced-circularity re-rank
        (``select_best``, ``…stage.py:350-353``)."""
        return select_best_frame_exact(masks, self.cfg.predict.topk_frames)

    def predict_case(self, sweep: np.ndarray,
                     spacing: Optional[Tuple[float, float]] = None,
                     threshold: Optional[float] = None):
        """Full sweep → (best_frame, refined_mask, ac_mm): the honest
        end-to-end path.

        The reference refined every frame before selecting
        (``…stage.py:490-503``); since selection only ever looks at the
        ``topk`` largest candidates, this refines just the top
        ``topk + refine_margin`` frames, ranked by a refined-area proxy
        (full-resolution close + quarter-resolution hole fill — see
        ``candidate_rank_areas``) so ring-shaped and dense-dither masks
        rank where their refined area puts them; downward refinement moves
        (speck removal, largest-CC) are bounded and absorbed by the margin.
        Selection within the candidates is the exact cv2-parity re-rank on
        the fully refined masks.

        TTA note: see :meth:`predict_full` — ``tta_hflip`` defaults off
        here (deployment config), unlike the reference predict CLI path.
        """
        return self.predict_case_collect(self.predict_case_submit(
            sweep, threshold), spacing)

    def _case_program(self, staged, nv, thr: float, n: int, H: int, W: int):
        """Assemble the case-serving program call — ONE source of truth
        for the jit dispatch (:meth:`predict_case_submit`), the AOT
        export (:meth:`export_aot`) and the AOT lookup fingerprint
        (``utils/aot_cache``).

        Returns ``(fn, statics, dyn_kwargs)``: the full jit call is
        ``fn(self._apply, self.variables, staged, nv, *statics.values(),
        **dyn_kwargs, **static_kwargs)`` — concretely below — and the
        AOT-compiled executable is invoked with only the dynamic leaves
        ``(self.variables, staged, nv, **dyn_kwargs)``."""
        from ..postprocess.refine import refine_bucket_hw

        p, pc = self.cfg.preprocess, self.cfg.predict
        m = max(1, min(pc.topk_frames + pc.refine_margin, n))
        if getattr(pc, "cascade", False):
            # The refined candidate set and the tier-2 micro-batch are both
            # bounded by the promote count: you cannot refine frames you
            # never ran at full resolution, and zero-padding 8 promoted
            # frames to a b16 micro-batch doubles the tier-2 forward for
            # nothing (probe r32: one b8 tier-2 batch runs the 840-frame
            # case x1.30 over the padded b16, pick/AC fidelity 12/12).
            # n_scout keeps at least topk frames in play so the exact
            # re-rank in predict_case_collect always has its full set.
            n_scout = min(max(pc.cascade_scouts, pc.topk_frames),
                          staged.shape[0])
            statics = dict(
                img_size=p.img_size,
                low_size=self._scout_img_size or pc.cascade_img_size,
                clahe_clip=p.clahe_clip, clahe_grid=p.clahe_grid,
                median_kernel=p.median_kernel,
                batch=min(pc.frame_batch, n_scout), tta=pc.tta_hflip,
                gauss_k=pc.gaussian_kernel, threshold=float(thr),
                n_scout=n_scout, n_cand=min(m, n_scout),
                min_area_px=pc.min_area_px, min_area_frac=pc.min_area_frac,
                close_kernel=pc.close_kernel, bucket_hw=refine_bucket_hw(H, W),
                lowres_enhance=getattr(pc, "cascade_lowres_enhance", False),
                scout_batch=scout_micro_batch(
                    staged.shape[0], getattr(pc, "cascade_scout_batch", 0),
                    pc.frame_batch),
                scout_thr=self._scout_thr,
                scout_clip=p.clahe_clip if self._scout_clahe else 0.0,
                scout_rank=getattr(pc, "cascade_scout_rank", "refined"))
            return (_predict_case_cascade_impl, statics,
                    {"scout_variables": self._scout_variables})
        statics = dict(
            img_size=p.img_size, clahe_clip=p.clahe_clip,
            clahe_grid=p.clahe_grid, median_kernel=p.median_kernel,
            batch=pc.frame_batch, tta=pc.tta_hflip,
            gauss_k=pc.gaussian_kernel, threshold=float(thr), n_cand=m,
            min_area_px=pc.min_area_px, min_area_frac=pc.min_area_frac,
            close_kernel=pc.close_kernel, bucket_hw=refine_bucket_hw(H, W))
        return _predict_case_impl, statics, {}

    def _bulk_program(self, staged, nv, thr: float, n: int, H: int, W: int):
        """Bulk analog of :meth:`_case_program` — the same three
        consumers (jit dispatch, AOT export, AOT fingerprint) for the
        (S, N, H, W) group program."""
        from ..postprocess.refine import refine_bucket_hw

        p, pc = self.cfg.preprocess, self.cfg.predict
        m = max(1, min(pc.topk_frames + pc.refine_margin, n))
        n_scout = min(max(pc.cascade_scouts, pc.topk_frames),
                      staged.shape[1])
        statics = dict(
            img_size=p.img_size,
            low_size=self._scout_img_size or pc.cascade_img_size,
            clahe_clip=p.clahe_clip, clahe_grid=p.clahe_grid,
            median_kernel=p.median_kernel,
            batch=min(getattr(pc, "bulk_frame_batch", 16),
                      staged.shape[0] * n_scout),
            tta=pc.tta_hflip, gauss_k=pc.gaussian_kernel,
            threshold=float(thr), n_scout=n_scout, n_cand=min(m, n_scout),
            min_area_px=pc.min_area_px, min_area_frac=pc.min_area_frac,
            close_kernel=pc.close_kernel, bucket_hw=refine_bucket_hw(H, W),
            lowres_enhance=getattr(pc, "cascade_lowres_enhance", False),
            scout_batch=scout_micro_batch(
                staged.shape[0] * staged.shape[1],
                getattr(pc, "cascade_scout_batch", 0), pc.frame_batch),
            scout_thr=self._scout_thr,
            scout_clip=p.clahe_clip if self._scout_clahe else 0.0,
            scout_rank=getattr(pc, "cascade_scout_rank", "refined"))
        return (_predict_bulk_cascade_impl, statics,
                {"scout_variables": self._scout_variables})

    def _roi_program(self, staged):
        """ROI-path analog of :meth:`_case_program` (container boot path,
        ``inference.py:50-133`` contract) — same three consumers: jit
        dispatch, AOT export, AOT fingerprint.  The ROI program has no
        ``nv`` operand (the subsample index map is applied host-side)."""
        p, pc = self.cfg.preprocess, self.cfg.predict
        statics = dict(clahe_clip=p.clahe_clip, clahe_grid=p.clahe_grid,
                       median_kernel=p.median_kernel, roi=pc.roi_size,
                       batch=pc.frame_batch)
        return _predict_roi_impl, statics, {}

    def _case_call_args(self, fn, statics, staged, nv=None):
        """(args, kwargs) for the jit call of a case/bulk/roi program:
        the leading operands positionally, every static by KEYWORD (the
        static names differ slightly between the impls — keyword
        passing can never mis-slot one), plus the static scout apply fn
        for the cascade programs.  ``nv=None`` → programs without the
        frame-count operand (ROI)."""
        kw = dict(statics)
        if fn not in (_predict_case_impl, _predict_roi_impl):
            kw["scout_apply_fn"] = self._scout_apply
        args = (self._apply, self.variables, staged)
        return (args if nv is None else args + (nv,)), kw

    def _aot_fingerprint(self, fn, statics, dyn_kwargs, staged,
                         nv=None) -> str:
        """AOT entry key: program name + dynamic shape/dtype tree (pins
        the parameter tree, hence the architecture) + static values +
        model/scout config + jax version/backend (utils/aot_cache).

        Memoized per (program, staged shape/dtype, statics): the variables
        tree and dyn_kwargs are engine-lifetime state, so the expensive
        tree-flatten + JSON + sha256 runs once per program per engine, not
        on every submit; ``self._aot_key_cache`` is cleared wherever
        ``self.variables`` is reassigned."""
        memo = (fn.__name__, tuple(staged.shape), str(staged.dtype),
                tuple(sorted(statics.items())))
        hit = self._aot_key_cache.get(memo)
        if hit is not None:
            return hit
        from ..utils.aot_cache import program_key

        statics_sig = dict(statics,
                           model=repr(self.cfg.model),
                           scout=repr((self.cfg.predict.cascade_scout_weights,
                                       self._scout_img_size)))
        dyn = ((self.variables, staged) if nv is None
               else (self.variables, staged, nv))
        key = program_key(fn.__name__, dyn, dyn_kwargs, statics_sig)
        self._aot_key_cache[memo] = key
        return key

    def _aot_serve(self, fn, statics, dyn_kwargs, staged, nv=None):
        """Dispatch via an AOT-deserialized executable when
        ``PredictConfig.aot_dir`` holds a matching entry; None → caller
        uses the jit path.  Loaded executables are memoized per engine."""
        aot_dir = getattr(self.cfg.predict, "aot_dir", None)
        if not aot_dir or self.mesh is not None:
            # mesh serving bakes shardings into the executable — out of
            # scope for the single-chip deployment artifact; jit handles it
            return None
        from ..utils.aot_cache import load_executable

        key = self._aot_fingerprint(fn, statics, dyn_kwargs, staged, nv)
        if key not in self._aot_loaded:
            self._aot_loaded[key] = load_executable(
                aot_dir, key, log=lambda m: print(m, file=sys.stderr))
            state = ("MISS (jit fallback)" if self._aot_loaded[key] is None
                     else "hit")
            print(f"[aot] {fn.__name__} "
                  f"{'x'.join(map(str, staged.shape))} → {key}: {state}",
                  file=sys.stderr)
        exe = self._aot_loaded[key]
        if exe is None:
            return None
        if nv is None:
            return exe(self.variables, staged, **dyn_kwargs)
        return exe(self.variables, staged, nv, **dyn_kwargs)

    def export_aot(self, aot_dir, shapes, threshold: Optional[float] = None,
                   bulk: int = 0, roi: bool = False, log=print):
        """Lower + compile the case-serving program for each ``(n, H, W)``
        in ``shapes`` — plus, with ``bulk`` > 1 on a cascade config, the
        ``(bulk, n, H, W)`` group program, and with ``roi``, the
        container's ROI program (``predict_roi`` — the Grand-Challenge
        boot path) — and serialize the executables to ``aot_dir``
        (deployment cold-start elimination — NOTES.md probes r38/r40/r41;
        run on the hardware + jax version you deploy on).  Returns the
        entry keys.  ``cli warm --export-aot`` is the CLI surface."""
        from ..utils.aot_cache import save_executable

        pc = self.cfg.predict
        if self.mesh is not None:
            # _aot_serve skips mesh engines (shardings would be baked into
            # the artifact) — exporting from one would write entries that
            # can never be served; fail loudly instead of silently
            raise ValueError(
                "export_aot requires a single-device engine: mesh-sharded "
                "executables bake shardings into the artifact and the AOT "
                "serving path (_aot_serve) never loads them")

        def _one(fn, statics, dyn_kwargs, staged, nv, shape_label, thr):
            args, static_kw = self._case_call_args(fn, statics, staged, nv)
            key = self._aot_fingerprint(fn, statics, dyn_kwargs, staged, nv)
            t0 = time.time()
            compiled = fn.lower(*args, **static_kw, **dyn_kwargs).compile()
            path = save_executable(
                aot_dir, key, compiled,
                meta={"program": fn.__name__, "shape": shape_label,
                      "threshold": float(thr)})
            log(f"[aot] {fn.__name__} {'x'.join(map(str, shape_label))} "
                f"thr={float(thr):.3f} → {path.name} "
                f"({path.stat().st_size / 1e6:.1f} MB, "
                f"compile {time.time() - t0:.1f}s)")
            return key

        thr = pc.threshold if threshold is None else threshold
        keys = []
        for (n, H, W) in shapes:
            # int8 lowering: calibrate activation scales BEFORE lowering
            # (zero-sweep calibration, matching `warm`) — otherwise the
            # export either traces without the 'quant' collection or
            # fingerprints a tree that serve time (which calibrates
            # lazily) can never match, making `predict --aot` silently
            # fall back to jit for int8 deployments
            self._ensure_quant(np.zeros((n, H, W), np.uint8))
            staged, _ = self._stage_frames(np.zeros((n, H, W), np.uint8))
            nv = jax.device_put(np.int32(n))
            fn, statics, dyn_kwargs = self._case_program(
                staged, nv, float(thr), n, H, W)
            keys.append(_one(fn, statics, dyn_kwargs, staged, nv,
                             [n, H, W], thr))
            if bulk > 1 and getattr(pc, "cascade", False):
                # stage exactly as predict_bulk_submit does (device pad
                # of the frame axis; single-device — AOT skips the mesh)
                arr = jnp.asarray(np.zeros((bulk, n, H, W), np.uint8))
                pad_n = (-n) % pc.frame_batch
                if pad_n:
                    arr = jnp.pad(arr,
                                  ((0, 0), (0, pad_n), (0, 0), (0, 0)))
                bfn, bstatics, bdyn = self._bulk_program(
                    arr, nv, float(thr), n, H, W)
                keys.append(_one(bfn, bstatics, bdyn, arr, nv,
                                 [bulk, n, H, W], thr))
            if roi:
                # the container subsamples to subsample_frames before the
                # ROI program runs (predict_roi), so the staged shape is
                # the SUBSAMPLED one
                n_sub = min(pc.subsample_frames, n)
                rstaged, _ = self._stage_frames(
                    np.zeros((n_sub, H, W), np.uint8))
                rfn, rstatics, rdyn = self._roi_program(rstaged)
                keys.append(_one(rfn, rstatics, rdyn, rstaged, None,
                                 [n_sub, H, W], thr))
        return keys

    def predict_case_submit(self, sweep: np.ndarray,
                            threshold: Optional[float] = None):
        """Dispatch the device side of :meth:`predict_case` without blocking.

        Returns an opaque handle for :meth:`predict_case_collect`.  The
        split lets a serving loop pipeline sweeps: submit sweep i+1 while
        the host finishes (transfer + exact select + ellipse AC) sweep i,
        hiding the ~50 ms/round-trip axon-tunnel latency under device
        compute."""
        pc = self.cfg.predict
        thr = pc.threshold if threshold is None else threshold
        n, H, W = sweep.shape

        self._ensure_quant(sweep)
        staged, pad = self._stage_frames(sweep)
        # n_valid is a TRACED operand (one compile per padded shape bucket,
        # not per frame count) staged once per distinct n so repeat calls
        # don't pay a scalar upload through the tunnel
        nv = self._nval_cache.get(n)
        if nv is None:
            nv = self._nval_cache.setdefault(
                n, jax.device_put(np.int32(n)))
        fn, statics, dyn_kwargs = self._case_program(
            staged, nv, float(thr), n, H, W)
        out = self._aot_serve(fn, statics, dyn_kwargs, staged, nv)
        if out is None:
            args, static_kw = self._case_call_args(fn, statics, staged, nv)
            out = fn(*args, **static_kw, **dyn_kwargs)
        cand_idx, refined = out
        return cand_idx, refined, W

    def predict_case_collect(self, handle,
                             spacing: Optional[Tuple[float, float]] = None):
        """Finish a :meth:`predict_case_submit`: one combined device→host
        pull of (candidate indices, bit-packed masks), exact circularity
        re-rank, ellipse AC."""
        pc = self.cfg.predict
        cand_dev, refined_dev, W = handle
        cand_idx, packed = jax.device_get((cand_dev, refined_dev))
        refined = np.unpackbits(packed, axis=-1, count=W)
        local = select_best_frame_exact(refined, pc.topk_frames)
        best_frame = int(cand_idx[local])
        best_mask = refined[local]
        ac = (self.measure(best_mask, spacing)
              if spacing is not None else float("nan"))
        return best_frame, best_mask, ac

    def measure(self, mask: np.ndarray, spacing: Tuple[float, float]) -> float:
        return measure_ac_mm(np.asarray(mask), spacing)

    # ---------------- bulk (multi-sweep) cascade serving ----------------

    def predict_bulk_submit(self, sweeps: np.ndarray,
                            threshold: Optional[float] = None):
        """Dispatch S independent same-shape sweeps as ONE device program.

        ``sweeps`` is (S, N, H, W); requires ``PredictConfig.cascade``
        (the direct path has no n-independent fixed block worth
        amortizing).  The per-call fixed block — tier-2 micro-batch
        padding, the latency-bound refine propagation, program glue
        (~76 ms, probes r33/r34) — is shared across the S sweeps:
        promotion and selection stay per sweep, tier 2 forwards all
        S·n_scout promoted frames in shared ``bulk_frame_batch``
        micro-batches, and all candidates refine in one bucketed call.
        One compile per (S, N, H, W) — batch fixed-size groups.

        With a mesh the SWEEP axis shards over the data axis (sweeps are
        independent end-to-end, so bulk serving is embarrassingly data
        parallel; ragged groups pad with zero sweeps that are dropped at
        collect).
        """
        pc = self.cfg.predict
        if not getattr(pc, "cascade", False):
            raise ValueError("predict_bulk requires PredictConfig.cascade")
        S, n, H, W = sweeps.shape
        thr = pc.threshold if threshold is None else threshold
        self._ensure_quant(sweeps[0])
        # stage WITHOUT a host round trip: a device-resident group must
        # stay device-resident (np-concatenate staging here re-uploaded
        # the whole group on EVERY submit — 117 MB/submit at S=2 through
        # the ~36 MB/s tunnel swamped the entire bulk win, probe r35's
        # first run); padding is a device op
        arr = jnp.asarray(sweeps)
        pad_n = (-n) % pc.frame_batch
        if pad_n:
            arr = jnp.pad(arr, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        pad_s = 0
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding
            d = self.mesh.shape[self.mesh.axis_names[0]]
            pad_s = (-S) % d
            if pad_s:
                arr = jnp.pad(arr, ((0, pad_s), (0, 0), (0, 0), (0, 0)))
            staged = jax.device_put(arr, batch_sharding(self.mesh, arr.ndim))
        else:
            staged = arr
        nv = self._nval_cache.get(n)
        if nv is None:
            nv = self._nval_cache.setdefault(n, jax.device_put(np.int32(n)))
        fn, statics, dyn_kwargs = self._bulk_program(
            staged, nv, float(thr), n, H, W)
        out = self._aot_serve(fn, statics, dyn_kwargs, staged, nv)
        if out is None:
            args, static_kw = self._case_call_args(fn, statics, staged, nv)
            out = fn(*args, **static_kw, **dyn_kwargs)
        cand_idx, packed = out
        return cand_idx, packed, W, S

    def predict_bulk_collect(self, handle,
                             spacing: Optional[Tuple[float, float]] = None):
        """Finish a :meth:`predict_bulk_submit`: one device→host pull,
        then the per-sweep exact circularity re-rank + ellipse AC.
        Returns ``[(best_frame, refined_mask, ac_mm), …]`` of length S."""
        pc = self.cfg.predict
        cand_dev, packed_dev, W, S = handle
        cand_idx, packed = jax.device_get((cand_dev, packed_dev))
        out = []
        for s in range(S):
            refined = np.unpackbits(packed[s], axis=-1, count=W)
            local = select_best_frame_exact(refined, pc.topk_frames)
            best_frame = int(cand_idx[s, local])
            best_mask = refined[local]
            ac = (self.measure(best_mask, spacing)
                  if spacing is not None else float("nan"))
            out.append((best_frame, best_mask, ac))
        return out

    def predict_bulk(self, sweeps: np.ndarray,
                     spacing: Optional[Tuple[float, float]] = None,
                     threshold: Optional[float] = None):
        """S same-shape sweeps → ``[(best_frame, mask, ac_mm), …]`` via one
        bulk cascade program; per-sweep results match S
        :meth:`predict_case` calls (tested exactly on CPU)."""
        return self.predict_bulk_collect(
            self.predict_bulk_submit(sweeps, threshold), spacing)

    # ---------------- ROI (container) path ----------------

    def predict_roi(self, sweep: np.ndarray) -> jax.Array:
        """Raw (N, H, W) sweep → (n_sub, H, W) probabilities via the
        128-frame / 224² ROI deployment path.  With a mesh, the subsampled
        frame axis shards over the data axis (frames are independent)."""
        p = self.cfg.preprocess
        pc = self.cfg.predict
        n = sweep.shape[0]
        self._ensure_quant(sweep)
        idxs = np.linspace(0, n - 1, min(pc.subsample_frames, n)).astype(int)
        staged, pad = self._stage_frames(np.asarray(sweep)[idxs])
        fn, statics, dyn_kwargs = self._roi_program(staged)
        out = self._aot_serve(fn, statics, dyn_kwargs, staged)
        if out is None:
            out = fn(self._apply, self.variables, staged, **statics)
        return out[: out.shape[0] - pad] if pad else out

    def postprocess_roi(self, probs: jax.Array) -> jax.Array:
        return postprocess_roi_stack(probs, 0.05)


class BaselineEngine:
    """PlainConvUNet + sliding-window tiled inference (nnU-Net-style path).

    With a ``mesh``, the frame axis shards over the data axis exactly like
    the att-aspp paths — tiles of different frames are independent.
    """

    def __init__(self, cfg: Config, variables: dict,
                 model: Optional[PlainConvUNet] = None, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.variables = {"params": variables["params"]}
        if mesh is not None:
            from ..parallel.mesh import replicate
            self.variables = jax.device_put(self.variables, replicate(mesh))
        else:
            self.variables = jax.device_put(self.variables)  # see AttAsppEngine
        self.model = model or PlainConvUNet.from_config(cfg.plain_unet)
        self._apply = functools.partial(self.model.apply, train=False)

    def predict(self, sweep: np.ndarray) -> jax.Array:
        """Raw (N, H, W) sweep → (C, N, H, W) softmax probabilities."""
        p = self.cfg.preprocess
        pu = self.cfg.plain_unet
        staged, pad = stage_frames(self.mesh, np.asarray(sweep), 1)
        x = preprocess_sweep(staged, None, p.clahe_clip,
                             p.clahe_grid, p.median_kernel)
        probs = sliding_window_predict(self._apply, self.variables, x,
                                       tuple(pu.patch_size), pu.tile_step,
                                       pu.use_gaussian, pu.use_mirroring,
                                       getattr(pu, "tile_batch", 8),
                                       getattr(pu, "mirror_batch", False))
        if pad:
            probs = probs[: probs.shape[0] - pad]
        return jnp.transpose(probs, (1, 0, 2, 3))       # (N,C,H,W)→(C,N,H,W)

    def postprocess(self, probabilities: jax.Array) -> jax.Array:
        return postprocess_softmax_stack(probabilities, 0.5)


def select_mask_and_frame(mask_stack: np.ndarray) -> Tuple[np.ndarray, int]:
    """Max-area frame pick with the −1/empty contract
    (``select_fetal_abdomen_mask_and_frame``)."""
    if np.ndim(mask_stack) == 2:
        return (np.asarray(mask_stack) > 0).astype(np.uint8), 0
    sel, frame = select_max_area_frame(jnp.asarray(mask_stack))
    return np.asarray(sel), int(frame)


def resize_mask_to(mask: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour paste-back to native resolution
    (``inference.py:95-103``)."""
    if mask.shape == tuple(hw):
        return (mask > 0).astype(np.uint8)
    out = resize_nearest(jnp.asarray(mask), tuple(hw))
    return (np.asarray(out) > 0).astype(np.uint8)
