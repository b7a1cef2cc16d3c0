"""Probe r26 — distilled scout: timing + promotion fidelity.

Probe r25 attributed ~62 % of the cascade case's device time to the
tier-1 scout forward running the FULL-capacity model (base_c 48) at
256².  The scout only ranks frames; tier 2 re-runs the main model on the
promoted set, so scout capacity affects promotion fidelity only.  A
distilled base_c-16 scout (1/9 the conv FLOPs) trained on the same
synthetic task (train_synthetic_tpu.py --img-size 256 --base-c 16
--out resources/synthetic_scout) should cut the case time ~0.3 s.

Measures, one process (trained weights, calibrated thresholds):
- per engine (full-scout cascade, distilled-scout cascade): 140-frame
  sweep dispatch-only + sequential, 840-frame case dispatch-only;
- fidelity across 12 synthetic seeds: pick agreement distilled vs full
  scout, and both AC errors vs the generator's analytic truth.
"""

from __future__ import annotations

import dataclasses
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
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r26] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    scout_dir = root / "resources" / "synthetic_scout"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scal = json.loads((scout_dir / "thr.json").read_text())
    scout_thr = float(scal.get("best_thr_no_tta", scal["best_thr"]))
    px_mm = 0.28
    spacing = (0.28, 0.28)

    base = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=16, tta_hflip=False, cascade=True,
                              cascade_img_size=256, cascade_scouts=32,
                              cascade_lowres_enhance=True,
                              cascade_scout_batch=128),
    )
    model = AttentionASPPUNet.from_config(base.model)
    scfg = dataclasses.replace(base, predict=dataclasses.replace(
        base.predict,
        cascade_scout_weights=str(scout_dir / "weights.npz"),
        cascade_scout_base_c=16, cascade_scout_thr=scout_thr))
    engines = {
        "full": AttAsppEngine(base, variables, model=model),
        "scout": AttAsppEngine(scfg, variables, model=model),
    }
    print(f"[r26] main thr={thr} scout thr={scout_thr}", file=sys.stderr)

    host_sweep, _, _ = make_sweep(140, 562, 744, seed=0)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()
    case_np = np.concatenate(
        [make_sweep(140, 562, 744, seed=100 + s)[0] for s in range(6)])
    case = jax.device_put(case_np)
    case.block_until_ready()

    iters = 6
    results = {}
    for name, eng in engines.items():
        t0 = time.time()
        f0, _, ac0 = eng.predict_case(sweep, spacing, threshold=thr)
        print(f"[r26] {name}: sweep compile+warm {time.time()-t0:.1f}s "
              f"pick=({int(f0)}, {float(ac0):.1f})", file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_case_submit(sweep, thr)
                   for _ in range(2 * iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / (2 * iters)
        for h in handles:
            eng.predict_case_collect(h, spacing)
        seq_t = []
        for _ in range(iters):
            t0 = time.time()
            eng.predict_case_collect(eng.predict_case_submit(sweep, thr),
                                     spacing)
            seq_t.append(time.time() - t0)
        seq = sorted(seq_t)[len(seq_t) // 2]
        print(f"[r26] {name}: sweep disp-only {disp:.3f} s ({140/disp:.1f} "
              f"f/s), sequential {seq:.3f} s", file=sys.stderr)

        t0 = time.time()
        eng.predict_case(case, spacing, threshold=thr)
        print(f"[r26] {name}: case compile+warm {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_case_submit(case, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        cdisp = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r26] {name}: case-840 dispatch-only {cdisp:.3f} s "
              f"({840/cdisp:.1f} f/s)", file=sys.stderr)
        results[name] = dict(sweep_disp=disp, sweep_seq=seq, case_disp=cdisp)

    # ---- fidelity across seeds ----
    rows, agree = [], 0
    for seed in range(12):
        host, true_idx, truth = make_sweep(140, 562, 744, seed=seed)
        true_ac = truth.circumference_px() * px_mm
        sw = jax.device_put(host)
        sw.block_until_ready()
        f_f, _, ac_f = engines["full"].predict_case(sw, spacing,
                                                    threshold=thr)
        f_s, _, ac_s = engines["scout"].predict_case(sw, spacing,
                                                     threshold=thr)
        agree += int(f_f == f_s)
        rows.append({"seed": seed, "true_idx": int(true_idx),
                     "true_ac": round(true_ac, 2),
                     "full": [int(f_f), round(float(ac_f), 2)],
                     "scout": [int(f_s), round(float(ac_s), 2)],
                     "err_f": round(abs(float(ac_f) - true_ac), 2),
                     "err_s": round(abs(float(ac_s) - true_ac), 2)})
        print(f"[r26] seed {seed}: true ({true_idx}, {true_ac:.1f})  "
              f"full {rows[-1]['full']} err {rows[-1]['err_f']}  "
              f"scout {rows[-1]['scout']} err {rows[-1]['err_s']}",
              file=sys.stderr)

    med_f = float(np.median([r["err_f"] for r in rows]))
    med_s = float(np.median([r["err_s"] for r in rows]))
    f, s = results["full"], results["scout"]
    print(f"[r26] SUMMARY sweep disp x{f['sweep_disp']/s['sweep_disp']:.2f} "
          f"case x{f['case_disp']/s['case_disp']:.2f} (>1 = scout wins); "
          f"agreement {agree}/12; median err full {med_f:.2f} "
          f"scout {med_s:.2f} mm", file=sys.stderr)
    print(json.dumps({"probe": "r26", "results": results, "rows": rows,
                      "agreement": agree,
                      "median_err_full_mm": round(med_f, 2),
                      "median_err_scout_mm": round(med_s, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
