"""Probe r34 — what rules the cascade's ~76 ms per-case FIXED block?

r33: the fused lean-config program runs 0.076 s for a 140-frame sweep
and 0.087 s for an 840-frame case — so ~76 ms is n-independent.  r32
showed halving the refine batch (16→8) changes NOTHING, i.e. the
refine is latency-bound, not batch-bound.  Component bursts through
the tunnel are useless at this scale (r33's parts sum to 5× the fused
program — dispatch noise), so r34 times each piece ON DEVICE with the
K-chained loop + scalar-carry methodology (CLAUDE.md): each iteration
sees a fresh-layout input via a data-dependent no-op XOR, the whole
loop is one dispatch, and only the final scalar comes back.

Pieces, on the 8-candidate native-res refine bucket (8×704×768) with
REALISTIC masks (trained weights, synthetic sweep, production
threshold):

  close7    binary_closing, 7-px ellipse (74 shifted adds)
  label     label_components 8-conn (while_loop of segmented cummax)
  sizes     component_sizes (jnp.sort 540k/frame + longest-equal-run)
  largest   label + sizes + keep mask (the refine's first stage)
  fill      fill_holes (second fixed-point propagation, 4-conn)
  refine    the full _refine_mask_padded body
  rank128   candidate_rank_areas over 840×128² (the scout tier's key)
  iters     converged iteration counts for label/fill (instrumented
            while_loop twin)

If label+fill dominate: attack the propagation (fixed unrolled trip
count, cheaper convergence check).  If sizes dominates: replace the
sort.  If close7 dominates: fold the ellipse into two 1-D passes.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

K = 16  # chained iterations per timed dispatch


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import (candidate_rank_areas,
                                                predict_sweep_probs)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.ops.image import gaussian_blur, resize_bilinear
    from att_aspp_unet_tpu.postprocess.cc import (_fixed_point,
                                                  _make_propagate,
                                                  component_sizes,
                                                  label_components,
                                                  largest_component)
    from att_aspp_unet_tpu.postprocess.morphology import (binary_closing,
                                                          fill_holes,
                                                          structuring_ellipse)
    from att_aspp_unet_tpu.postprocess.refine import (_refine_mask_padded,
                                                      refine_bucket_hw)
    from att_aspp_unet_tpu.preprocess import enhance_frames
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r34] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    cfg = Config(preprocess=PreprocessConfig(img_size=512),
                 model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=8, tta_hflip=False))
    model = AttentionASPPUNet.from_config(cfg.model)
    apply_fn = lambda v, x: model.apply(v, x, train=False)

    H, W = 562, 744
    hb, wb = refine_bucket_hw(H, W)
    frames, _, _ = make_sweep(140, H, W, seed=100)

    # realistic 8-candidate refine input: trained forward → blur → threshold,
    # top-8 by the production rank key
    @jax.jit
    def stage(fr):
        u8 = enhance_frames(fr, 1.0, (8, 8), 3)
        x = resize_bilinear(u8.astype(jnp.float32), (512, 512)) / 255.0
        ph = predict_sweep_probs(apply_fn, variables, x, 8, hflip=False)
        p = gaussian_blur(resize_bilinear(ph, (H, W)), 5, 0.0)
        binary = (p > thr).astype(jnp.uint8)
        areas = candidate_rank_areas(binary, 7)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        cand = jnp.lexsort((-idx, -areas))[:8]
        return binary[cand]

    cand = stage(jax.device_put(frames))
    cand = jnp.pad(cand, ((0, 0), (0, hb - H), (0, wb - W)))
    cand.block_until_ready()
    fg_frac = float(jnp.mean(cand.astype(jnp.float32)))
    print(f"[r34] candidate masks staged: {cand.shape}, fg={fg_frac:.4f}",
          file=sys.stderr)
    assert fg_frac > 0, "staged candidates are empty — timings would be " \
                        "the degenerate 1-iteration case"

    # scout-tier rank input: 840 frames of 128² probabilities
    case = np.concatenate([make_sweep(140, H, W, seed=100 + s)[0]
                           for s in range(6)])
    s_dir = root / "resources" / "synthetic_scout_noclahe128"
    s_vars = jax.device_put(load_npz_variables(s_dir / "weights.npz"))
    s_thr = float(json.loads((s_dir / "thr.json").read_text())["best_thr"])
    s_model = AttentionASPPUNet.from_config(ModelConfig(base_c=16))
    s_apply = lambda v, x: s_model.apply(v, x, train=False)

    @jax.jit
    def scout_stage(s):
        x = enhance_frames(resize_bilinear(s.astype(jnp.float32), (128, 128)),
                           0.0, (8, 8), 3).astype(jnp.float32) / 255.0
        p = predict_sweep_probs(s_apply, s_vars, x, 128, hflip=False)
        return (p > s_thr).astype(jnp.uint8)

    bin_lo = scout_stage(jax.device_put(case))
    bin_lo.block_until_ready()

    se7 = structuring_ellipse(7)
    true_hw = jnp.asarray([H, W], jnp.int32)

    # ---- chained on-device K-loop: one dispatch, scalar carry forces a
    # fresh data-dependent input each iteration (CLAUDE.md methodology) ----
    def chained(op, x0):
        @jax.jit
        def run(x0):
            def body(i, c):
                x = x0 ^ (c >> 30).astype(x0.dtype)  # c < 2^30 → no-op XOR
                out = op(x)
                return jnp.minimum(
                    c + out.astype(jnp.int32).sum() % 7 + 1, jnp.int32(1 << 29))
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))
        return run

    def timeit(name, op, x0, reps=3):
        run = chained(op, x0)
        float(run(x0))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(run(x0))
            ts.append((time.time() - t0) / K)
        dt = float(np.median(ts))
        print(f"[r34] {name}: {dt * 1e3:.2f} ms (K={K} chained, median of "
              f"{reps})", file=sys.stderr)
        return dt

    parts = {}
    parts["close7"] = timeit("close7 (8×704×768)",
                             lambda m: binary_closing(m, se7), cand)
    parts["label"] = timeit("label 8-conn",
                            lambda m: label_components(m, 8, 2), cand)

    lab = label_components(cand, 8, 2)
    lab.block_until_ready()
    parts["sizes"] = timeit("sizes (sort 540k ×8)",
                            lambda l: component_sizes(l, 2)[1], lab)
    parts["largest"] = timeit("largest (label+sizes+keep)",
                              lambda m: largest_component(m, 8, 2, 20), cand)

    kept = largest_component(cand, 8, 2, 20)
    closed = binary_closing(kept, se7)
    closed.block_until_ready()
    parts["fill"] = timeit("fill_holes", fill_holes, closed)
    parts["refine"] = timeit(
        "refine (full padded body)",
        lambda m: _refine_mask_padded(m, true_hw, 20, 0.0015, 7), cand)
    parts["rank128"] = timeit(
        "rank128 (candidate_rank_areas 840×128²)",
        lambda b: candidate_rank_areas(b, 7), bin_lo)

    # ---- converged iteration counts (instrumented twin of _fixed_point) ----
    def count_iters(fg_mask, seed_labels, conn):
        prop = _make_propagate(fg_mask, 2, conn)

        def cond(s):
            return s[1] & (s[2] < 128)

        def body(s):
            lab, _, it = s
            new = prop(lab)
            return new, jnp.any(new != lab), it + 1

        _, _, it = jax.lax.while_loop(
            cond, body, (seed_labels, jnp.bool_(True), jnp.int32(0)))
        return int(it)

    import math
    fgb = cand.astype(bool)
    flat = jnp.arange(1, math.prod(fgb.shape[-2:]) + 1,
                      dtype=jnp.int32).reshape(fgb.shape[-2:])
    lab0 = jnp.where(fgb, jnp.broadcast_to(flat, fgb.shape), jnp.int32(2**30))
    it_label = count_iters(fgb, lab0, 8)
    bg = ~closed.astype(bool)
    border = jnp.zeros((hb, wb), bool).at[0, :].set(True).at[-1, :] \
        .set(True).at[:, 0].set(True).at[:, -1].set(True)
    seed = jnp.where(bg & border, jnp.int32(0), jnp.int32(1))
    seed = jnp.where(bg, seed, jnp.int32(2 ** 30))
    it_fill = count_iters(bg, seed, 4)
    print(f"[r34] converged iterations: label={it_label} fill={it_fill}",
          file=sys.stderr)

    total = parts["refine"]
    print(f"[r34] SUMMARY refine={total * 1e3:.1f} ms; "
          f"label {parts['label'] * 1e3:.1f} + sizes "
          f"{parts['sizes'] * 1e3:.1f} + close {parts['close7'] * 1e3:.1f} "
          f"+ fill {parts['fill'] * 1e3:.1f}", file=sys.stderr)
    print(json.dumps({"probe": "r34",
                      "parts_ms": {k: round(v * 1e3, 2)
                                   for k, v in parts.items()},
                      "iters": {"label": it_label, "fill": it_fill},
                      "fg_frac": round(fg_frac, 5)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
