"""Probe r20 — w2d_stage lowering A/B on the production serving path.

Probe r19 measured the packed d1/u1 stages in isolation with fresh-layout
inputs (the r18d methodology).  This probe answers the question that
matters: does ``conv_lowering="w2d_stage"`` — the zero-relayout
width-packed full-resolution level — beat ``direct`` on the REAL e2e
serving path (trained weights, 140×562×744 sweep, calibrated threshold)?

Both engines run in ONE process (cross-process compile caching is broken
through the axon tunnel, NOTES.md).  Reported per lowering:

- forward fresh-layout loop, b16 @512² (device-resident A/B of the net);
- e2e dispatch-only s/sweep (back-to-back submits, one readback);
- e2e sequential median (submit → collect);
- max |Δp| between the two lowerings' probability fields (TPU exactness).
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
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, \
        PredictConfig, PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r20] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    host_sweep, _, _ = make_sweep(args.frames, 562, 744, seed=0)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()

    x16 = jax.device_put(np.random.default_rng(0).random(
        (args.batch, 512, 512, 1), np.float32))
    K = args.k

    results = {}
    probs = {}
    for lowering in ("direct", "w2d_stage"):
        cfg = Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48, conv_lowering=lowering),
            predict=PredictConfig(frame_batch=args.batch, tta_hflip=False),
        )
        model = AttentionASPPUNet.from_config(cfg.model)
        engine = AttAsppEngine(cfg, variables, model=model)

        # --- forward fresh-layout loop (scalar-carry dependence) ---
        def fwd_loop(x0, variables):
            def it(i, carry):
                out, _ = model.apply(variables, x0 + carry * 1e-30,
                                     train=False)
                return carry + jnp.sum(out).astype(jnp.float32) * 1e-30
            return lax.fori_loop(0, K, it, jnp.float32(0.0))

        f = jax.jit(fwd_loop)
        t0 = time.time()
        float(jnp.sum(f(x16, engine.variables)))
        print(f"[r20] {lowering}: fwd compile {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(jnp.sum(f(x16, engine.variables)))
            ts.append(time.time() - t0)
        fwd = sorted(ts)[len(ts) // 2] / K
        print(f"[r20] {lowering}: fwd b{args.batch} fresh-layout "
              f"{fwd*1e3:7.2f} ms/batch "
              f"({args.batch/fwd:.0f} f/s)", file=sys.stderr)

        # --- e2e warm + exactness field ---
        t0 = time.time()
        pf = engine.predict_full(sweep)
        probs[lowering] = np.asarray(pf[:4]).astype(np.float32)
        engine.predict_case(sweep, (0.28, 0.28), threshold=thr)
        print(f"[r20] {lowering}: e2e compile+warm {time.time()-t0:.1f}s",
              file=sys.stderr)

        # --- dispatch-only ---
        n_disp = 2 * args.iters
        t0 = time.time()
        handles = [engine.predict_case_submit(sweep, thr)
                   for _ in range(n_disp)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / n_disp
        for h in handles:
            engine.predict_case_collect(h, (0.28, 0.28))
        print(f"[r20] {lowering}: dispatch-only {disp:.3f} s/sweep "
              f"({args.frames/disp:.1f} f/s)", file=sys.stderr)

        # --- sequential ---
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            engine.predict_case_collect(
                engine.predict_case_submit(sweep, thr), (0.28, 0.28))
            ts.append(time.time() - t0)
        seq = sorted(ts)[len(ts) // 2]
        print(f"[r20] {lowering}: sequential {seq:.3f} s/sweep "
              f"({args.frames/seq:.1f} f/s)", file=sys.stderr)
        results[lowering] = dict(fwd_ms=fwd * 1e3, disp=disp, seq=seq)

    dp = float(np.abs(probs["direct"] - probs["w2d_stage"]).max())
    print(f"[r20] max |dp| direct vs w2d_stage: {dp:.2e}", file=sys.stderr)
    d, w = results["direct"], results["w2d_stage"]
    print(f"[r20] SUMMARY fwd x{d['fwd_ms']/w['fwd_ms']:.2f}  "
          f"disp x{d['disp']/w['disp']:.2f}  seq x{d['seq']/w['seq']:.2f} "
          f"(>1 = packed wins)", file=sys.stderr)
    print(json.dumps({"probe": "r20", **{f"{k}_{m}": round(v, 4)
          for k, r in results.items() for m, v in r.items()},
          "max_dp": dp}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
