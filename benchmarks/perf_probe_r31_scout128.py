"""Probe r31 — 128-px distilled scout: the next scout-resolution step.

After r30 (promote count 32 -> 16) the remaining case time is dominated
by tier 1: the 256-px scout forward over every frame plus the low-res
enhance.  A scout TRAINED at 128 px (1/4 the scout FLOPs again) is a
different bet from r21's rejected scout-192: that failure ran the
512-trained MAIN model at an alien resolution; this scout never sees
anything but 128-px frames.  Ranking needs far less capacity than
segmenting (r26), but 128 px may genuinely lose the rim structure.

Measures, in ONE process on trained weights (bench methodology):

  fidelity: 12 synthetic seeds — picks vs the DIRECT engine (gold
            standard), vs the shipping nc256 cascade, direct-pick
            survival inside the promoted set, median |AC err| vs the
            generator's analytic truth;
  perf:     840-frame-case and 140-frame-sweep dispatch-only times for
            nc256 (shipping default) and nc128.

Requires resources/synthetic_scout_noclahe128 (train_synthetic_tpu.py
--img-size 128 --base-c 16 --no-clahe).
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

    print(f"[r31] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    def cascade_cfg(scout_dir: Path, low_size: int, scouts: int = 16) -> Config:
        s_cal = json.loads((scout_dir / "thr.json").read_text())
        return Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48),
            predict=PredictConfig(
                frame_batch=16, tta_hflip=False, cascade=True,
                cascade_img_size=low_size, cascade_scouts=scouts,
                cascade_lowres_enhance=True, cascade_scout_batch=128,
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=16, cascade_scout_clahe=False,
                cascade_scout_thr=float(s_cal.get("best_thr_no_tta",
                                                  s_cal["best_thr"]))))

    nc256_dir = root / "resources" / "synthetic_scout_noclahe"
    nc128_dir = root / "resources" / "synthetic_scout_noclahe128"
    if not (nc128_dir / "weights.npz").exists():
        print(f"[r31] {nc128_dir} missing — train it first", file=sys.stderr)
        return 1
    direct_cfg = Config(preprocess=PreprocessConfig(img_size=512),
                        model=ModelConfig(base_c=48),
                        predict=PredictConfig(frame_batch=16,
                                              tta_hflip=False))
    variants = {
        "direct": AttAsppEngine(direct_cfg, variables),
        "nc256": AttAsppEngine(cascade_cfg(nc256_dir, 256), variables),
        "nc128": AttAsppEngine(cascade_cfg(nc128_dir, 128), variables),
        "nc128s24": AttAsppEngine(cascade_cfg(nc128_dir, 128, scouts=24),
                                  variables),
    }

    # ---- fidelity over the r26/r30 seed protocol (140-frame sweeps) ----
    spacing = (0.28, 0.28)
    picks = {k: [] for k in variants}
    ac_err = {k: [] for k in variants}
    survival = {k: 0 for k in variants if k != "direct"}
    for s in range(N_SEEDS):
        frames, best_idx, truth = make_sweep(SWEEP_FRAMES, 562, 744,
                                             seed=300 + s)
        true_ac = (ellipse_circumference(truth.ry * 0.28, truth.rx * 0.28)
                   if truth.present else float("nan"))
        frames = jax.device_put(frames)
        for k, eng in variants.items():
            f, _, ac = eng.predict_case(frames, spacing, threshold=thr)
            picks[k].append(int(f))
            ac_err[k].append(abs(ac - true_ac))
        d_pick = picks["direct"][-1]
        # survival: does the direct pick reach the variant's final
        # candidate set (the frames tier 2 refined)?  A pick can only
        # change if promotion dropped it before that stage (r30 pattern:
        # predict_case_submit's first handle is the candidate index set).
        for k in survival:
            cand = np.asarray(jax.device_get(
                variants[k].predict_case_submit(frames, thr)[0]))
            survival[k] += int((cand == d_pick).any())
        print(f"[r31] seed {s}: " + " ".join(
            f"{k}={picks[k][-1]}" for k in variants), file=sys.stderr)

    agree_direct = {k: sum(int(a == b)
                           for a, b in zip(picks[k], picks["direct"]))
                    for k in variants}
    med_err = {k: float(np.median(ac_err[k])) for k in variants}
    print(f"[r31] agreement vs direct over {N_SEEDS} seeds: {agree_direct}",
          file=sys.stderr)
    print(f"[r31] direct pick inside promoted set: {survival} / {N_SEEDS}",
          file=sys.stderr)
    print(f"[r31] median |AC err| vs analytic truth (mm): {med_err}",
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
    for k, eng in variants.items():
        if k == "direct":
            continue                      # r30 pinned direct's numbers
        cs = burst(eng, case_np)
        sw = burst(eng, sweep_np)
        perf[k] = {"case_s": round(cs, 3),
                   "case_fps": round(CASE_FRAMES / cs, 1),
                   "sweep_s": round(sw, 3),
                   "sweep_fps": round(SWEEP_FRAMES / sw, 1)}
        print(f"[r31] {k}: case {cs:.3f}s ({CASE_FRAMES / cs:.0f} f/s) "
              f"sweep {sw:.3f}s ({SWEEP_FRAMES / sw:.0f} f/s)",
              file=sys.stderr)

    print(json.dumps({"probe": "r31", "thr": thr, "n_seeds": N_SEEDS,
                      "agreement_vs_direct": agree_direct,
                      "direct_pick_survival": survival,
                      "median_ac_err_mm": med_err,
                      "picks": picks, "perf": perf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
