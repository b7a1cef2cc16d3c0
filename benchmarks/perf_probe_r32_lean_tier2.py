"""Probe r32 — lean tier 2: after the 128-px scout, the FIXED block rules.

r31's numbers imply the scout tier is nearly free now: case − sweep =
0.118 − 0.107 s for 700 extra scouted frames (~2 ms/140 frames), so
~0.105 s of BOTH shapes is the per-case fixed block — tier-2 forward
(16 frames @512², micro-batch 16), refine (16 candidates), native
enhance of the promoted frames, rank, select.  The next lever is the
size of that block:

  - ``refine_margin`` 11 → 3 shrinks the refined candidate set 16 → 8
    (m = topk 5 + margin); the margin exists to absorb rank-proxy
    reordering (pooled-fill vs refined area — the round-2 advisor's
    speckle concern), so fidelity must be re-measured, not assumed;
  - with m=8 and ``cascade_scouts`` 8, ``frame_batch`` 8 turns tier 2
    into ONE b8 micro-batch (b16 zero-pads 8 promoted frames to 16 —
    half the tier-2 forward is padding);
  - the middle option keeps 16 promoted (2× promotion margin) and only
    shrinks the refine set.

Variants, one process, trained weights, nc128 scout (r31 shipping
default), 12-seed fidelity protocol with the DIRECT engine as oracle:

  ship    margin 11, scouts 16, frame_batch 16   (r31 default)
  m8s16   margin 3,  scouts 16, frame_batch 16   (refine 8, tier-2 16)
  m8fb16  margin 3,  scouts 8,  frame_batch 16   (tier-2 8 padded to 16)
  m8fb8   margin 3,  scouts 8,  frame_batch 8    (tier-2 one b8 batch)

Survival here is the strictest form: the direct pick must reach the
variant's REFINED candidate set (`predict_case_submit`'s first handle),
which for m=8 is half the r31 set.
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

    print(f"[r32] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    scout_dir = root / "resources" / "synthetic_scout_noclahe128"
    s_cal = json.loads((scout_dir / "thr.json").read_text())
    s_thr = float(s_cal.get("best_thr_no_tta", s_cal["best_thr"]))

    def cascade_cfg(margin: int, scouts: int, fb: int) -> Config:
        return Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48),
            predict=PredictConfig(
                frame_batch=fb, tta_hflip=False, cascade=True,
                refine_margin=margin, cascade_scouts=scouts,
                cascade_img_size=128, cascade_lowres_enhance=True,
                cascade_scout_batch=128,
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=16, cascade_scout_clahe=False,
                cascade_scout_thr=s_thr))

    direct_cfg = Config(preprocess=PreprocessConfig(img_size=512),
                        model=ModelConfig(base_c=48),
                        predict=PredictConfig(frame_batch=16,
                                              tta_hflip=False))
    variants = {
        "direct": AttAsppEngine(direct_cfg, variables),
        "ship": AttAsppEngine(cascade_cfg(11, 16, 16), variables),
        "m8s16": AttAsppEngine(cascade_cfg(3, 16, 16), variables),
        "m8fb16": AttAsppEngine(cascade_cfg(3, 8, 16), variables),
        "m8fb8": AttAsppEngine(cascade_cfg(3, 8, 8), variables),
    }

    # ---- fidelity over the r26/r30/r31 seed protocol ----
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
        for k in survival:
            cand = np.asarray(jax.device_get(
                variants[k].predict_case_submit(frames, thr)[0]))
            survival[k] += int((cand == d_pick).any())
        print(f"[r32] seed {s}: " + " ".join(
            f"{k}={picks[k][-1]}" for k in variants), file=sys.stderr)

    agree_direct = {k: sum(int(a == b)
                           for a, b in zip(picks[k], picks["direct"]))
                    for k in variants}
    med_err = {k: float(np.median(ac_err[k])) for k in variants}
    print(f"[r32] agreement vs direct over {N_SEEDS} seeds: {agree_direct}",
          file=sys.stderr)
    print(f"[r32] direct pick inside REFINED set: {survival} / {N_SEEDS}",
          file=sys.stderr)
    print(f"[r32] median |AC err| vs analytic truth (mm): {med_err}",
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
            continue
        cs = burst(eng, case_np)
        sw = burst(eng, sweep_np)
        perf[k] = {"case_s": round(cs, 3),
                   "case_fps": round(CASE_FRAMES / cs, 1),
                   "sweep_s": round(sw, 3),
                   "sweep_fps": round(SWEEP_FRAMES / sw, 1)}
        print(f"[r32] {k}: case {cs:.3f}s ({CASE_FRAMES / cs:.0f} f/s) "
              f"sweep {sw:.3f}s ({SWEEP_FRAMES / sw:.0f} f/s)",
              file=sys.stderr)

    print(json.dumps({"probe": "r32", "thr": thr, "n_seeds": N_SEEDS,
                      "agreement_vs_direct": agree_direct,
                      "direct_pick_survival_refined_set": survival,
                      "median_ac_err_mm": med_err,
                      "picks": picks, "perf": perf}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
