"""Probe r29 — scout-tier diets: no-CLAHE preprocessing + closed-only rank.

Probe r28 attributed the distilled-scout case and found two tier-1-only
diets: CLAHE is ~80 % of the low-res enhance, and the pooled hole-fill
proxy is ~73 % of the tier-1 rank key.  Both are fidelity questions about
WHICH frames promote, never about served masks (tier 2 unchanged — the
exactness tests pin that).  This probe measures, in ONE process on trained
weights:

  fidelity: over 12 synthetic seeds (the r26 protocol), frame picks + ACs
            for each variant vs the shipping default AND vs the sweep
            generator's analytic truth;
  perf:     840-frame-case and 140-frame-sweep dispatch-only times per
            variant (bench.py methodology: submits back-to-back, one
            readback of the final handle).

Variants:  base   = distilled CLAHE scout, refined rank (shipping default)
           nc     = no-CLAHE scout (resources/synthetic_scout_noclahe)
           cl     = CLAHE scout, closed-only rank
           nc+cl  = both diets

Methodology note: r28's standalone-part bursts and its fused number were
inflated vs bench.py's same-day measurement (cross-stage fusion + live
buffer pressure); this probe only uses the bench-validated fused
submit/collect pattern.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_SEEDS = 12
CASE_FRAMES = 840
SWEEP_FRAMES = 140


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.measure.ellipse import ellipse_circumference
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r29] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    def scout_cfg(scout_dir: Path, **diet) -> Config:
        s_cal = json.loads((scout_dir / "thr.json").read_text())
        return Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48),
            predict=PredictConfig(
                frame_batch=16, tta_hflip=False, cascade=True,
                cascade_img_size=256, cascade_scouts=32,
                cascade_lowres_enhance=True, cascade_scout_batch=128,
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=16,
                cascade_scout_thr=float(s_cal.get("best_thr_no_tta",
                                                  s_cal["best_thr"])),
                **diet))

    clahe_dir = root / "resources" / "synthetic_scout"
    nc_dir = root / "resources" / "synthetic_scout_noclahe"
    variants = {
        "base": scout_cfg(clahe_dir),
        "cl": scout_cfg(clahe_dir, cascade_scout_rank="closed"),
    }
    if (nc_dir / "weights.npz").exists():
        variants["nc"] = scout_cfg(nc_dir, cascade_scout_clahe=False)
        variants["nc+cl"] = scout_cfg(nc_dir, cascade_scout_clahe=False,
                                      cascade_scout_rank="closed")
    else:
        print(f"[r29] {nc_dir} missing — CLAHE-scout variants only",
              file=sys.stderr)
    engines = {k: AttAsppEngine(cfg, variables) for k, cfg in variants.items()}

    # ---- fidelity over the r26 seed protocol (140-frame sweeps) ----
    spacing = (0.28, 0.28)
    picks = {k: [] for k in engines}
    ac_err = {k: [] for k in engines}
    for s in range(N_SEEDS):
        frames, best_idx, truth = make_sweep(SWEEP_FRAMES, 562, 744,
                                             seed=300 + s)
        true_ac = (ellipse_circumference(truth.ry * 0.28, truth.rx * 0.28)
                   if truth.present else float("nan"))
        frames = jax.device_put(frames)   # one upload shared by variants
        for k, eng in engines.items():
            f, _, ac = eng.predict_case(frames, spacing, threshold=thr)
            picks[k].append(int(f))
            ac_err[k].append(abs(ac - true_ac))
        print(f"[r29] seed {s}: " + " ".join(
            f"{k}={picks[k][-1]}" for k in engines), file=sys.stderr)

    agree = {k: sum(int(a == b) for a, b in zip(picks[k], picks["base"]))
             for k in engines}
    med_err = {k: float(np.median(ac_err[k])) for k in engines}
    print(f"[r29] agreement vs base over {N_SEEDS} seeds: {agree}",
          file=sys.stderr)
    print(f"[r29] median |AC err| vs analytic truth (mm): {med_err}",
          file=sys.stderr)

    # ---- perf: dispatch-only burst (bench.py methodology) ----
    def burst(eng, stack, iters=5):
        eng.predict_case(stack, spacing, threshold=thr)  # compile+warm
        t0 = time.time()
        handles = [eng.predict_case_submit(stack, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        dt = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        return dt

    case_np = jax.device_put(np.concatenate(
        [make_sweep(SWEEP_FRAMES, 562, 744, seed=100 + s)[0]
         for s in range(CASE_FRAMES // SWEEP_FRAMES)]))
    sweep_np = jax.device_put(np.asarray(case_np[:SWEEP_FRAMES]))
    perf = {}
    for k, eng in engines.items():
        cs = burst(eng, case_np)
        sw = burst(eng, sweep_np)
        perf[k] = {"case_s": round(cs, 3),
                   "case_fps": round(CASE_FRAMES / cs, 1),
                   "sweep_s": round(sw, 3),
                   "sweep_fps": round(SWEEP_FRAMES / sw, 1)}
        print(f"[r29] {k}: case {cs:.3f}s ({CASE_FRAMES / cs:.0f} f/s) "
              f"sweep {sw:.3f}s ({SWEEP_FRAMES / sw:.0f} f/s)",
              file=sys.stderr)

    print(json.dumps({"probe": "r29", "thr": thr, "n_seeds": N_SEEDS,
                      "agreement_vs_base": agree,
                      "median_ac_err_mm": med_err,
                      "picks": picks, "perf": perf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
