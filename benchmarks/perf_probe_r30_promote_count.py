"""Probe r30 — cascade promote count: how few frames can tier 2 re-run?

After r29 the cascade's remaining in-graph cost at SWEEP granularity is
dominated by tier 2: the full-res enhance + base_c-48 forward on the
``cascade_scouts`` promoted frames (32 of 140 ≈ 23 % of a direct run's
forward work, vs 32 of 840 ≈ 4 % at case granularity — so this knob
matters most for the 140-frame sweep number, the metric with the least
margin over the ≥500 f/s north star).

Promotion is a fidelity question: the served mask/frame/AC come from
tier 2, so they change ONLY if the eventual best frame falls outside the
promoted set.  Unlike the r29 diets (which altered tier-1 ranking), a
smaller promote count is a strict prefix of the same ranking — if the
scout ranks the true best frame in its top-k, top-k promotes behave
identically to top-32.

Measures, in ONE process on trained weights (bench methodology):
  fidelity: over 12 synthetic seeds, picks + AC vs the top-32 default,
            vs the DIRECT (no-cascade) engine, and vs analytic truth;
  survival: whether the direct engine's pick reaches each variant's
            final candidate set (the only stage promotion can drop it);
  perf:     840-frame-case and 140-frame-sweep dispatch-only times for
            cascade_scouts in {8, 16, 24, 32}.
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
PROMOTE = (8, 16, 24, 32)


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

    print(f"[r30] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    scout_dir = root / "resources" / "synthetic_scout_noclahe"
    if not (scout_dir / "weights.npz").exists():
        scout_dir = root / "resources" / "synthetic_scout"
    s_cal = json.loads((scout_dir / "thr.json").read_text())
    s_thr = float(s_cal.get("best_thr_no_tta", s_cal["best_thr"]))

    def cfg(n_promote: int, cascade: bool = True) -> Config:
        return Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48),
            predict=PredictConfig(
                frame_batch=16, tta_hflip=False, cascade=cascade,
                cascade_img_size=256, cascade_scouts=n_promote,
                cascade_lowres_enhance=True, cascade_scout_batch=128,
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=16, cascade_scout_thr=s_thr))

    engines = {f"top{n}": AttAsppEngine(cfg(n), variables) for n in PROMOTE}
    direct = AttAsppEngine(cfg(32, cascade=False), variables)

    # ---- fidelity over the r26/r29 seed protocol (140-frame sweeps) ----
    spacing = (0.28, 0.28)
    keys = list(engines) + ["direct"]
    picks = {k: [] for k in keys}
    ac_err = {k: [] for k in keys}
    for s in range(N_SEEDS):
        frames, best_idx, truth = make_sweep(SWEEP_FRAMES, 562, 744,
                                             seed=300 + s)
        true_ac = (ellipse_circumference(truth.ry * 0.28, truth.rx * 0.28)
                   if truth.present else float("nan"))
        frames = jax.device_put(frames)   # one upload shared by variants
        for k in keys:
            eng = direct if k == "direct" else engines[k]
            f, _, ac = eng.predict_case(frames, spacing, threshold=thr)
            picks[k].append(int(f))
            ac_err[k].append(abs(ac - true_ac))
        print(f"[r30] seed {s}: " + " ".join(
            f"{k}={picks[k][-1]}" for k in keys), file=sys.stderr)

    agree32 = {k: sum(int(a == b) for a, b in zip(picks[k], picks["top32"]))
               for k in keys}
    agree_dir = {k: sum(int(a == b) for a, b in zip(picks[k], picks["direct"]))
                 for k in keys}
    med_err = {k: float(np.median(ac_err[k])) for k in keys}
    print(f"[r30] agreement vs top32 over {N_SEEDS} seeds: {agree32}",
          file=sys.stderr)
    print(f"[r30] agreement vs direct: {agree_dir}", file=sys.stderr)
    print(f"[r30] median |AC err| vs analytic truth (mm): {med_err}",
          file=sys.stderr)

    # ---- survival: does the direct pick reach each variant's final
    # candidate set (the m = topk+margin frames that tier 2 refined)?
    # A pick can only change if promotion dropped it before this stage.
    survived = {k: [] for k in engines}
    for s in range(N_SEEDS):
        frames, _, _ = make_sweep(SWEEP_FRAMES, 562, 744, seed=300 + s)
        frames = jax.device_put(frames)
        d = picks["direct"][s]
        for k, eng in engines.items():
            cand = np.asarray(jax.device_get(
                eng.predict_case_submit(frames, thr)[0]))
            survived[k].append(bool((cand == d).any()))
    surv_counts = {k: sum(v) for k, v in survived.items()}
    print(f"[r30] direct pick inside the final candidate set: {surv_counts}"
          f" / {N_SEEDS}", file=sys.stderr)

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
        print(f"[r30] {k}: case {cs:.3f}s ({CASE_FRAMES / cs:.0f} f/s) "
              f"sweep {sw:.3f}s ({SWEEP_FRAMES / sw:.0f} f/s)",
              file=sys.stderr)

    print(json.dumps({"probe": "r30", "thr": thr, "n_seeds": N_SEEDS,
                      "agreement_vs_top32": agree32,
                      "agreement_vs_direct": agree_dir,
                      "median_ac_err_mm": med_err,
                      "direct_pick_survival": surv_counts,
                      "picks": picks, "perf": perf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
