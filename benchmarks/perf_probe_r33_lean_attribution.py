"""Probe r33 — where does the 0.088 s lean-config case go?

r32 shipped the lean tier 2 (8 promotes, one b8 micro-batch, refined
set clamped to the promote count): 840-frame case 0.088 s dispatch-only
(9525 f/s).  Before chasing the next diet, attribute that time across
the component programs of the SHIPPING config (128-px no-CLAHE
distilled scout, scout batch 128, lowres enhance, b8 tier 2):

  A pre128    resize 128² → min-max → median over all 840 frames
  B fwd128    distilled base_c-16 forward, 840 frames @128² b128
  C rank128   threshold → candidate_rank_areas → top-8 (128² masks)
  D tier2     enhance 8 native frames → resize 512² → forward b8 →
              resize back native → 5×5 blur
  E rank_hi   threshold → rank → top-8 at native res (8 frames)
  F refine    bucketed CC-refine of the 8 candidates
  G pack      bit-pack the 8 refined masks

Plus the HYPOTHETICAL next scout diet, timed with the 128-px scout
weights run at 64² (timing only — a real 64-px scout would need its own
distillation run and fidelity sweep; NOTES.md r31 flagged that 64-px
frames blur the abdominal rim):

  A64 pre64   resize 64² → min-max → median over all 840 frames
  B64 fwd64   distilled forward @64² b256

If (A+B+C) dominates and (A64+B64) collapses it, a 64-px distillation
is the next lever; if D rules, the tier-2 b8 512² forward is the floor
and the cascade is done dieting on one chip.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASE_FRAMES = 840
SWEEP_FRAMES = 140


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import (AttAsppEngine, _packbits_w,
                                                candidate_rank_areas,
                                                predict_sweep_probs)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.ops.image import gaussian_blur, resize_bilinear
    from att_aspp_unet_tpu.postprocess.refine import (_refine_mask_padded,
                                                      refine_bucket_hw)
    from att_aspp_unet_tpu.preprocess import enhance_frames
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r33] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    scout_dir = root / "resources" / "synthetic_scout_noclahe128"
    s_vars = jax.device_put(load_npz_variables(scout_dir / "weights.npz"))
    s_cal = json.loads((scout_dir / "thr.json").read_text())
    s_thr = float(s_cal.get("best_thr_no_tta", s_cal["best_thr"]))

    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=128, cascade_scouts=8,
            cascade_scout_weights=str(scout_dir / "weights.npz"),
            cascade_scout_base_c=16, cascade_scout_clahe=False,
            cascade_scout_thr=s_thr))
    model = AttentionASPPUNet.from_config(cfg.model)
    apply_fn = lambda v, x: model.apply(v, x, train=False)
    s_model = AttentionASPPUNet.from_config(
        ModelConfig(base_c=16, conv_lowering=cfg.model.conv_lowering))
    s_apply = lambda v, x: s_model.apply(v, x, train=False)

    case_np = np.concatenate(
        [make_sweep(SWEEP_FRAMES, 562, 744, seed=100 + s)[0]
         for s in range(CASE_FRAMES // SWEEP_FRAMES)])
    case = jax.device_put(case_np)
    case.block_until_ready()
    H, W = 562, 744
    spacing = (0.28, 0.28)

    # ---- component programs (mirror _predict_case_cascade_impl at the
    # shipping config: lowres_enhance + scout_clip<=0 → resize → min-max →
    # median, no CLAHE) ----
    def pre_at(size):
        @jax.jit
        def pre(s):
            return enhance_frames(
                resize_bilinear(s.astype(jnp.float32), (size, size)),
                0.0, (8, 8), 3).astype(jnp.float32) / 255.0
        return pre

    def fwd_at(batch):
        @jax.jit
        def fwd(v, x):
            return predict_sweep_probs(s_apply, v, x, batch, hflip=False)
        return fwd

    @jax.jit
    def rank128(p):
        binary = (p > s_thr).astype(jnp.uint8)
        areas = candidate_rank_areas(binary, 7)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        return jnp.lexsort((-idx, -areas))[:8]

    @jax.jit
    def tier2(v, fr):
        u8 = enhance_frames(fr, 1.0, (8, 8), 3)
        x = resize_bilinear(u8.astype(jnp.float32), (512, 512)) / 255.0
        ph = predict_sweep_probs(apply_fn, v, x, 8, hflip=False)
        return gaussian_blur(resize_bilinear(ph, (H, W)), 5, 0.0)

    @jax.jit
    def rank_hi(p):
        binary = (p > thr).astype(jnp.uint8)
        areas = candidate_rank_areas(binary, 7)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        cand = jnp.lexsort((-idx, -areas))[:8]
        return cand, binary[cand]

    hb, wb = refine_bucket_hw(H, W)

    @jax.jit
    def refine(cand):
        padded = jnp.pad(cand, ((0, 0), (0, hb - H), (0, wb - W)))
        return _refine_mask_padded(padded, jnp.asarray([H, W], jnp.int32),
                                   20, 0.0015, 7)

    @jax.jit
    def pack(m):
        return _packbits_w(m)

    pre128, pre64 = pre_at(128), pre_at(64)
    fwd128, fwd64 = fwd_at(128), fwd_at(256)

    # stage realistic intermediate inputs
    x128 = pre128(case)
    x128.block_until_ready()
    p128 = fwd128(s_vars, x128)
    p128.block_until_ready()
    top8 = rank128(p128)
    fr8 = jax.device_put(case_np[np.asarray(top8)])
    fr8.block_until_ready()
    p_hi = tier2(variables, fr8)
    p_hi.block_until_ready()
    _, cand8 = rank_hi(p_hi)
    cand8.block_until_ready()
    ref8 = refine(cand8)
    ref8.block_until_ready()
    x64 = pre64(case)
    x64.block_until_ready()

    iters = 8

    def burst(name, fn, *args):
        fn(*args)  # warm
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        o = outs[-1]
        o = o[0] if isinstance(o, tuple) else o
        float(jnp.sum(o.astype(jnp.float32)))
        dt = (time.time() - t0) / iters
        print(f"[r33] {name}: {dt * 1e3:.1f} ms/case", file=sys.stderr)
        return dt

    parts = {}
    parts["A_pre128"] = burst("A pre128 (840 lowres no-CLAHE)", pre128, case)
    parts["B_fwd128"] = burst("B fwd128 (840 @128² b128)",
                              fwd128, s_vars, x128)
    parts["C_rank128"] = burst("C rank128 (840 @128²)", rank128, p128)
    parts["D_tier2"] = burst("D tier2 (8: enhance+fwd512 b8+resize+blur)",
                             tier2, variables, fr8)
    parts["E_rank_hi"] = burst("E rank_hi (8 native)", rank_hi, p_hi)
    parts["F_refine"] = burst("F refine (8 bucketed)", refine, cand8)
    parts["G_pack"] = burst("G pack (8 native)", pack, ref8)
    parts["A64_pre64"] = burst("A64 pre64 (hypothetical)", pre64, case)
    parts["B64_fwd64"] = burst("B64 fwd64 (hypothetical, b256)",
                               fwd64, s_vars, x64)

    # denominator: the real fused shipping program, case + single sweep
    eng = AttAsppEngine(cfg, variables, model=model)
    t0 = time.time()
    eng.predict_case(case, spacing, threshold=thr)
    print(f"[r33] fused compile+warm {time.time() - t0:.1f}s",
          file=sys.stderr)

    def fused_burst(stack, n):
        t0 = time.time()
        handles = [eng.predict_case_submit(stack, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        dt = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r33] fused {n}-frame dispatch-only {dt:.3f} s "
              f"({n / dt:.1f} f/s)", file=sys.stderr)
        return dt

    fused_case = fused_burst(case, CASE_FRAMES)
    sweep = jax.device_put(case_np[:SWEEP_FRAMES])
    eng.predict_case(sweep, spacing, threshold=thr)  # compile sweep shape
    fused_sweep = fused_burst(sweep, SWEEP_FRAMES)

    live = ("A_pre128", "B_fwd128", "C_rank128", "D_tier2", "E_rank_hi",
            "F_refine", "G_pack")
    total = sum(parts[k] for k in live)
    shares = {k: round(parts[k] / total, 3) for k in live}
    scout64 = parts["A64_pre64"] + parts["B64_fwd64"]
    scout128 = parts["A_pre128"] + parts["B_fwd128"]
    print(f"[r33] SUMMARY parts_sum={total:.3f}s fused_case={fused_case:.3f}s "
          f"shares={shares}", file=sys.stderr)
    print(f"[r33] scout tier 128px={scout128 * 1e3:.1f} ms vs hypothetical "
          f"64px={scout64 * 1e3:.1f} ms", file=sys.stderr)
    print(json.dumps({"probe": "r33",
                      "parts_ms": {k: round(v * 1e3, 1)
                                   for k, v in parts.items()},
                      "parts_sum_s": round(total, 3),
                      "fused_case_s": round(fused_case, 3),
                      "fused_sweep_s": round(fused_sweep, 3),
                      "shares_of_sum": shares}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
