"""Probe r23 — cascade scout with LOW-RES enhancement: timing + fidelity.

r21 made the two-tier cascade the fast serving path, but its scout tier
still pays native-resolution CLAHE+median over EVERY frame (~0.11 s per
140-frame sweep, ~6× that on an 840-frame case) before downsampling.
``cascade_lowres_enhance`` enhances the scout tier at the scout
resolution and only the 32 PROMOTED frames natively — tier 2 stays
bit-identical (enhancement is per-frame), so the only question is
whether the scout RANKING survives low-res CLAHE adaptation.

Measures, one process (trained weights, thr from thr.json):
- per variant (cascade, cascade+lowres): 140-frame sweep dispatch-only
  and sequential, 840-frame case dispatch-only;
- fidelity across 8 synthetic seeds: pick agreement lowres vs plain
  cascade, and both AC errors vs the generator's analytic truth.
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

    print(f"[r23] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    px_mm = 0.28
    spacing = (0.28, 0.28)

    base = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=16, tta_hflip=False, cascade=True,
                              cascade_img_size=256, cascade_scouts=32),
    )
    model = AttentionASPPUNet.from_config(base.model)
    engines = {
        "cascade": AttAsppEngine(base, variables, model=model),
        "lowres": AttAsppEngine(
            dataclasses.replace(base, predict=dataclasses.replace(
                base.predict, cascade_lowres_enhance=True)),
            variables, model=model),
    }

    host_sweep, _, _ = make_sweep(140, 562, 744, seed=0)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()
    case_np = np.concatenate(
        [make_sweep(140, 562, 744, seed=100 + s)[0] for s in range(6)])
    case = jax.device_put(case_np)
    case.block_until_ready()

    iters = 5
    results = {}
    for name, eng in engines.items():
        t0 = time.time()
        eng.predict_case(sweep, spacing, threshold=thr)
        print(f"[r23] {name}: sweep compile+warm {time.time()-t0:.1f}s",
              file=sys.stderr)

        n_disp = 2 * iters
        t0 = time.time()
        handles = [eng.predict_case_submit(sweep, thr)
                   for _ in range(n_disp)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / n_disp
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r23] {name}: sweep dispatch-only {disp:.3f} s "
              f"({140/disp:.1f} f/s)", file=sys.stderr)

        ts = []
        for _ in range(iters):
            t0 = time.time()
            eng.predict_case_collect(eng.predict_case_submit(sweep, thr),
                                     spacing)
            ts.append(time.time() - t0)
        seq = sorted(ts)[len(ts) // 2]
        print(f"[r23] {name}: sweep sequential {seq:.3f} s "
              f"({140/seq:.1f} f/s)", file=sys.stderr)

        t0 = time.time()
        eng.predict_case(case, spacing, threshold=thr)
        print(f"[r23] {name}: case compile+warm {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_case_submit(case, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        cdisp = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r23] {name}: case-840 dispatch-only {cdisp:.3f} s "
              f"({840/cdisp:.1f} f/s)", file=sys.stderr)
        results[name] = dict(sweep_disp=disp, sweep_seq=seq, case_disp=cdisp)

    # ---- fidelity across seeds ----
    rows, agree = [], 0
    for seed in range(8):
        host, true_idx, truth = make_sweep(140, 562, 744, seed=seed)
        true_ac = truth.circumference_px() * px_mm
        sw = jax.device_put(host)
        sw.block_until_ready()
        f_c, _, ac_c = engines["cascade"].predict_case(sw, spacing,
                                                       threshold=thr)
        f_l, _, ac_l = engines["lowres"].predict_case(sw, spacing,
                                                      threshold=thr)
        agree += int(f_c == f_l)
        rows.append({"seed": seed, "true_idx": int(true_idx),
                     "true_ac": round(true_ac, 2),
                     "cascade": [int(f_c), round(float(ac_c), 2)],
                     "lowres": [int(f_l), round(float(ac_l), 2)],
                     "err_c": round(abs(float(ac_c) - true_ac), 2),
                     "err_l": round(abs(float(ac_l) - true_ac), 2)})
        print(f"[r23] seed {seed}: true ({true_idx}, {true_ac:.1f})  "
              f"cascade {rows[-1]['cascade']} err {rows[-1]['err_c']}  "
              f"lowres {rows[-1]['lowres']} err {rows[-1]['err_l']}",
              file=sys.stderr)

    med_c = float(np.median([r["err_c"] for r in rows]))
    med_l = float(np.median([r["err_l"] for r in rows]))
    c, l = results["cascade"], results["lowres"]
    print(f"[r23] SUMMARY sweep disp x{c['sweep_disp']/l['sweep_disp']:.2f} "
          f"seq x{c['sweep_seq']/l['sweep_seq']:.2f} "
          f"case x{c['case_disp']/l['case_disp']:.2f} (>1 = lowres wins); "
          f"agreement {agree}/8; median err cascade {med_c:.2f} "
          f"lowres {med_l:.2f} mm", file=sys.stderr)
    print(json.dumps({"probe": "r23", "results": results, "rows": rows,
                      "agreement": agree,
                      "median_err_cascade_mm": round(med_c, 2),
                      "median_err_lowres_mm": round(med_l, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
