"""Probe r28 — where does the 0.36 s DISTILLED-scout case go?

r25 attributed the full-capacity-scout cascade (scout forward = 62 %);
r26's distilled base_c-16 scout collapsed that slice.  Re-attribute the
remaining time across the same component programs, now with the
distilled scout in tier 1, to rank the next levers:

  A scout_pre   resize 256² → CLAHE → median over all 840 frames
  B scout_fwd   DISTILLED 256² forward, micro-batch 128, 840 frames
  C scout_rank  threshold → candidate_rank_areas → top-32 (256² masks)
  C2 closedonly same rank key WITHOUT the pooled hole-fill proxy
  A2 nocla      scout preprocessing without CLAHE (resize+minmax+median)
  D tier2       enhance 32 native frames → resize 512² → forward b16 →
                resize back native → 5×5 blur
  E rank_hi     threshold → rank → top-16 at native res (32 frames)
  F refine      bucketed CC-refine of the 16 candidates

A2/C2 are the candidate diet versions: if A2≈0 vs A and C2 ≪ C, the
next lever is a no-CLAHE scout tier (needs a scout retrained on
min-max-only input) and/or a closed-area-only scout rank key — both
rank-fidelity questions, never mask-fidelity (tier 2 is unchanged).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import (AttAsppEngine,
                                                candidate_rank_areas,
                                                predict_sweep_probs)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.ops.image import (gaussian_blur, median3x3,
                                             minmax_normalize_u8,
                                             resize_bilinear)
    from att_aspp_unet_tpu.postprocess.morphology import (binary_closing,
                                                          structuring_ellipse)
    from att_aspp_unet_tpu.postprocess.refine import (_refine_mask_padded,
                                                      refine_bucket_hw)
    from att_aspp_unet_tpu.preprocess import enhance_frames
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r28] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    scout_dir = root / "resources" / "synthetic_scout"
    s_vars = jax.device_put(load_npz_variables(scout_dir / "weights.npz"))
    s_cal = json.loads((scout_dir / "thr.json").read_text())
    s_thr = float(s_cal.get("best_thr_no_tta", s_cal["best_thr"]))

    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=16, tta_hflip=False, cascade=True,
                              cascade_img_size=256, cascade_scouts=32,
                              cascade_lowres_enhance=True,
                              cascade_scout_batch=128,
                              cascade_scout_weights=str(
                                  scout_dir / "weights.npz"),
                              cascade_scout_base_c=16,
                              cascade_scout_thr=s_thr),
    )
    model = AttentionASPPUNet.from_config(cfg.model)
    apply_fn = lambda v, x: model.apply(v, x, train=False)
    s_model = AttentionASPPUNet.from_config(
        ModelConfig(base_c=16, conv_lowering=cfg.model.conv_lowering))
    s_apply = lambda v, x: s_model.apply(v, x, train=False)

    case_np = np.concatenate(
        [make_sweep(140, 562, 744, seed=100 + s)[0] for s in range(6)])
    case = jax.device_put(case_np)
    case.block_until_ready()
    H, W = 562, 744
    spacing = (0.28, 0.28)

    # ---- component programs (same blocks as _predict_case_cascade_impl) ----
    @jax.jit
    def scout_pre(s):
        return enhance_frames(
            resize_bilinear(s.astype(jnp.float32), (256, 256)),
            1.0, (8, 8), 3).astype(jnp.float32) / 255.0

    @jax.jit
    def scout_pre_noclahe(s):
        lo = resize_bilinear(s.astype(jnp.float32), (256, 256))
        return (median3x3(minmax_normalize_u8(lo))
                .astype(jnp.float32) / 255.0)

    @jax.jit
    def scout_fwd(v, x):
        return predict_sweep_probs(s_apply, v, x, 128, hflip=False)

    @jax.jit
    def scout_rank(p):
        binary = (p > s_thr).astype(jnp.uint8)
        areas = candidate_rank_areas(binary, 7)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        return jnp.lexsort((-idx, -areas))[:32]

    @jax.jit
    def scout_rank_closed_only(p):
        binary = (p > s_thr).astype(jnp.uint8)
        closed = binary_closing(binary, structuring_ellipse(7))
        areas = closed.sum(axis=(-2, -1), dtype=jnp.int32)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        return jnp.lexsort((-idx, -areas))[:32]

    @jax.jit
    def tier2(v, fr):
        u8 = enhance_frames(fr, 1.0, (8, 8), 3)
        x = resize_bilinear(u8.astype(jnp.float32), (512, 512)) / 255.0
        ph = predict_sweep_probs(apply_fn, v, x, 16, hflip=False)
        return gaussian_blur(resize_bilinear(ph, (H, W)), 5, 0.0)

    @jax.jit
    def rank_hi(p):
        binary = (p > thr).astype(jnp.uint8)
        areas = candidate_rank_areas(binary, 7)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        cand = jnp.lexsort((-idx, -areas))[:16]
        return cand, binary[cand]

    hb, wb = refine_bucket_hw(H, W)

    @jax.jit
    def refine(cand):
        padded = jnp.pad(cand, ((0, 0), (0, hb - H), (0, wb - W)))
        return _refine_mask_padded(padded, jnp.asarray([H, W], jnp.int32),
                                   20, 0.0015, 7)

    # stage realistic intermediate inputs
    x_lo = scout_pre(case)
    x_lo.block_until_ready()
    p_lo = scout_fwd(s_vars, x_lo)
    p_lo.block_until_ready()
    top32 = scout_rank(p_lo)
    fr32 = jax.device_put(case_np[np.asarray(top32)])
    fr32.block_until_ready()
    p_hi = tier2(variables, fr32)
    p_hi.block_until_ready()
    _, cand16 = rank_hi(p_hi)
    cand16.block_until_ready()

    iters = 6

    def burst(name, fn, *args):
        fn(*args)  # warm
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        o = outs[-1]
        o = o[0] if isinstance(o, tuple) else o
        float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"[r28] {name}: {dt * 1e3:.1f} ms/case", file=sys.stderr)
        return dt

    parts = {}
    parts["A_scout_pre"] = burst("A scout_pre (840 lowres enhance)",
                                 scout_pre, case)
    parts["A2_pre_noclahe"] = burst("A2 scout_pre no-CLAHE",
                                    scout_pre_noclahe, case)
    parts["B_scout_fwd"] = burst("B scout_fwd distilled (840 @256² b128)",
                                 scout_fwd, s_vars, x_lo)
    parts["C_scout_rank"] = burst("C scout_rank (840 @256²)",
                                  scout_rank, p_lo)
    parts["C2_rank_closed"] = burst("C2 scout_rank closed-only",
                                    scout_rank_closed_only, p_lo)
    parts["D_tier2"] = burst("D tier2 (32: enhance+fwd512+resize+blur)",
                             tier2, variables, fr32)
    parts["E_rank_hi"] = burst("E rank_hi (32 native)", rank_hi, p_hi)
    parts["F_refine"] = burst("F refine (16 bucketed)", refine, cand16)

    # denominator: the real fused cascade program with the distilled scout
    eng = AttAsppEngine(cfg, variables, model=model)
    t0 = time.time()
    eng.predict_case(case, spacing, threshold=thr)
    print(f"[r28] fused compile+warm {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    handles = [eng.predict_case_submit(case, thr) for _ in range(iters)]
    float(jnp.sum(handles[-1][0].astype(jnp.int32)))
    fused = (time.time() - t0) / iters
    for h in handles:
        eng.predict_case_collect(h, spacing)
    print(f"[r28] fused case dispatch-only {fused:.3f} s "
          f"({840 / fused:.1f} f/s)", file=sys.stderr)

    live = ("A_scout_pre", "B_scout_fwd", "C_scout_rank", "D_tier2",
            "E_rank_hi", "F_refine")
    total = sum(parts[k] for k in live)
    shares = {k: round(parts[k] / total, 3) for k in live}
    print(f"[r28] SUMMARY parts_sum={total:.3f}s fused={fused:.3f}s "
          f"shares={shares}", file=sys.stderr)
    print(json.dumps({"probe": "r28",
                      "parts_ms": {k: round(v * 1e3, 1)
                                   for k, v in parts.items()},
                      "parts_sum_s": round(total, 3),
                      "fused_case_s": round(fused, 3),
                      "shares_of_sum": shares}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
