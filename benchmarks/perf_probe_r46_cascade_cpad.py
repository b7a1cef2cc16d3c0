"""Probe r46 — c1_pad on the CASCADE headline config.

r42 shipped c1_pad=64 for the direct path (×1.043).  The cascade's
tier-2 forward runs the same base_c-48 model at 512² in one b8
micro-batch (~26 ms of the ~87 ms case fixed block, NOTES r33), so the
pad should buy a few percent of the HEADLINE figure.  A/B on the
shipping config (distilled 128-px no-CLAHE scout — which must stay
UNPADDED, engine._init_scout clears the knob; CPU exactness:
tests/test_cpad.py::test_cpad_composes_with_cascade), 840-frame case +
140-frame sweep dispatch-only, pick/AC agreement over 12 seeds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--case-frames", type=int, default=840)
    ap.add_argument("--seeds", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r46] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scout_dir = syn.parent / "synthetic_scout_noclahe128"
    scfg = json.loads((scout_dir / "summary.json").read_text())
    scal = json.loads((scout_dir / "thr.json").read_text())

    def cfg(pad):
        return Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48, c1_pad=pad),
            predict=PredictConfig(
                frame_batch=16, tta_hflip=False, cascade=True,
                cascade_img_size=int(scfg["img_size"]),
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=int(scfg["base_c"]),
                cascade_scout_thr=float(scal.get("best_thr_no_tta",
                                                 scal["best_thr"]))))

    host_case, _, _ = make_sweep(args.case_frames, 562, 744, seed=1)
    case = jax.device_put(host_case)
    case.block_until_ready()
    host_sweep, _, _ = make_sweep(140, 562, 744, seed=0)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()

    results, picks = {}, {}
    for pad in (0, 64):
        tag = f"p{pad}"
        engine = AttAsppEngine(cfg(pad), variables)
        t0 = time.time()
        engine.predict_case(case, (0.28, 0.28), threshold=thr)
        print(f"[r46] {tag}: case compile+warm {time.time()-t0:.1f}s",
              file=sys.stderr)
        r = {}
        for name, inp, n in (("case", case, args.case_frames),
                             ("sweep", sweep, 140)):
            if name == "sweep":
                t0 = time.time()
                engine.predict_case(inp, (0.28, 0.28), threshold=thr)
                print(f"[r46] {tag}: sweep compile+warm "
                      f"{time.time()-t0:.1f}s", file=sys.stderr)
            n_disp = max(2, args.iters)
            t0 = time.time()
            handles = [engine.predict_case_submit(inp, thr)
                       for _ in range(n_disp)]
            float(jnp.sum(handles[-1][0].astype(jnp.int32)))
            disp = (time.time() - t0) / n_disp
            for h in handles:
                engine.predict_case_collect(h, (0.28, 0.28))
            print(f"[r46] {tag}: {name}({n}) dispatch-only {disp:.3f} s "
                  f"({n/disp:.1f} f/s)", file=sys.stderr)
            r[f"{name}_disp_s"] = disp
        # fidelity over seeds (140-frame sweeps — shared compile)
        pk = []
        for s in range(args.seeds):
            fr, _, _ = make_sweep(140, 562, 744, seed=100 + s)
            f, _, ac = engine.predict_case(fr, (0.28, 0.28), threshold=thr)
            pk.append((int(f), round(float(ac), 3)))
        picks[tag] = pk
        results[tag] = r
    agree = sum(a[0] == b[0] for a, b in zip(picks["p0"], picks["p64"]))
    dac = max(abs(a[1] - b[1]) for a, b in zip(picks["p0"], picks["p64"]))
    print(f"[r46] picks agree {agree}/{args.seeds}, max |dAC| {dac:.3f} mm",
          file=sys.stderr)
    r0, r1 = results["p0"], results["p64"]
    print(f"[r46] SUMMARY case x{r0['case_disp_s']/r1['case_disp_s']:.3f} "
          f"sweep x{r0['sweep_disp_s']/r1['sweep_disp_s']:.3f} "
          f"(>1 = pad wins)", file=sys.stderr)
    print(json.dumps({"probe": "r46", "agree": agree, "max_dac_mm": dac,
                      "results": {t: {k: round(v, 5) for k, v in r.items()}
                                  for t, r in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
