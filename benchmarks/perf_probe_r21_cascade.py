"""Probe r21 — cascade serving A/B on the production path.

Direct vs cascade (scout 256², promote 32) predict_case on trained
weights, one process (NOTES.md compile-caching rule).  Reports per mode:
dispatch-only s/sweep, sequential median, and OUTPUT AGREEMENT (frame
pick + AC) across several distinct synthetic sweeps — the cascade's only
permitted deviation is an unpromoted frame winning, which agreement
checks directly on realistic content.
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--agree-sweeps", type=int, default=4)
    ap.add_argument("--scouts", type=int, default=32)
    ap.add_argument("--lows", default="256,192",
                    help="comma list of scout resolutions to A/B")
    ap.add_argument("--case-frames", type=int, default=840,
                    help="also time one full challenge case of this many "
                         "frames per variant (0 = skip)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, \
        PredictConfig, PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r21] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=args.batch, tta_hflip=False),
    )
    lows = [int(s) for s in args.lows.split(",") if s]
    variants = [("direct", cfg)]
    for low in lows:
        variants.append((f"cascade{low}", dataclasses.replace(
            cfg, predict=dataclasses.replace(
                cfg.predict, cascade=True, cascade_img_size=low,
                cascade_scouts=args.scouts))))
    model = AttentionASPPUNet.from_config(cfg.model)

    sweeps = []
    for s in range(args.agree_sweeps):
        host, _, _ = make_sweep(args.frames, 562, 744, seed=s)
        sweeps.append(jax.device_put(host))
    for sw in sweeps:
        sw.block_until_ready()

    results = {}
    outputs = {}
    for name, c in variants:
        engine = AttAsppEngine(c, variables, model=model)
        t0 = time.time()
        outs = [engine.predict_case(sw, (0.28, 0.28), threshold=thr)
                for sw in sweeps]
        outputs[name] = [(int(f), float(ac)) for f, _, ac in outs]
        print(f"[r21] {name}: compile+{args.agree_sweeps} sweeps "
              f"{time.time()-t0:.1f}s", file=sys.stderr)

        sweep = sweeps[0]
        n_disp = 2 * args.iters
        t0 = time.time()
        handles = [engine.predict_case_submit(sweep, thr)
                   for _ in range(n_disp)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / n_disp
        for h in handles:
            engine.predict_case_collect(h, (0.28, 0.28))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            engine.predict_case_collect(
                engine.predict_case_submit(sweep, thr), (0.28, 0.28))
            ts.append(time.time() - t0)
        seq = sorted(ts)[len(ts) // 2]
        print(f"[r21] {name}: dispatch-only {disp:.3f} s/sweep "
              f"({args.frames/disp:.1f} f/s)  sequential {seq:.3f} "
              f"({args.frames/seq:.1f} f/s)", file=sys.stderr)
        results[name] = dict(disp=disp, seq=seq)

        if args.case_frames:
            # full challenge case: fixed overheads amortize over 6 sweeps,
            # and the cascade's scout/promote ratio improves with n —
            # the single-chip ≥500 f/s question is decided here
            case_host, _, _ = make_sweep(args.case_frames, 562, 744, seed=9)
            case = jax.device_put(case_host)
            case.block_until_ready()
            t0 = time.time()
            engine.predict_case(case, (0.28, 0.28), threshold=thr)
            print(f"[r21] {name}: case compile+first "
                  f"{time.time()-t0:.1f}s", file=sys.stderr)
            tcs = []
            for _ in range(3):
                t0 = time.time()
                engine.predict_case(case, (0.28, 0.28), threshold=thr)
                tcs.append(time.time() - t0)
            tc = sorted(tcs)[len(tcs) // 2]
            print(f"[r21] {name}: case {tc:.3f} s "
                  f"({args.case_frames/tc:.1f} f/s)", file=sys.stderr)
            results[name]["case"] = tc

    line = {"probe": "r21",
            **{f"{k}_{m}": round(v, 4) for k, r in results.items()
               for m, v in r.items()}}
    d = results["direct"]
    for name, _ in variants[1:]:
        agree = [outputs["direct"][i][0] == outputs[name][i][0]
                 for i in range(args.agree_sweeps)]
        d_ac = [abs(outputs["direct"][i][1] - outputs[name][i][1])
                for i in range(args.agree_sweeps)]
        c = results[name]
        print(f"[r21] {name}: frame agreement {sum(agree)}/{len(agree)}  "
              f"|dAC| max {max(d_ac):.3f} mm  disp x{d['disp']/c['disp']:.2f}"
              f"  seq x{d['seq']/c['seq']:.2f} (>1 = cascade wins)",
              file=sys.stderr)
        line[f"{name}_frame_agree"] = sum(agree)
        line[f"{name}_max_dac_mm"] = round(max(d_ac), 4)
    print(f"[r21] picks: "
          f"{ {k: v for k, v in outputs.items()} }", file=sys.stderr)
    line["n_sweeps"] = args.agree_sweeps
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
