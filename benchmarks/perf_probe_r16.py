"""Probe r16 — CLAHE interpolation lowering: can the one-hot matmul's HBM
traffic come down, and what does that buy the e2e sweep path?

The production CLAHE interp materialises a (81, P, 256) bf16 one-hot per
frame (~274 MB) before the MXU contraction — ~77 GB of HBM traffic per
140-frame sweep, i.e. ~94 ms at v5e's ~819 GB/s.  That is most of the
~0.11 s CLAHE cost inside the 0.667 s/sweep dispatch-only bound (NOTES.md
probe r12), and the forward itself is at its argued MFU ceiling — CLAHE is
the one big non-forward lever left.

Variants (all in ``ops/clahe.py::_interp_blocks``):
- onehot_bf16: round-2 production path (baseline).
- onehot_int8: int8 one-hot against L−128, int32 accumulate — halves the
  one-hot bytes and rides the int8 MXU path.  Bit-identical.
- nibble: 16-wide one-hot of the low nibble (MXU, 16× less one-hot
  traffic), high nibble selected on the VPU; (P, 64) bf16 intermediate.

Stages (ONE process — cross-process compile caching is broken, NOTES.md):
1. standalone CLAHE at (140, 562, 744) per impl: median runtime + equality;
2. flip the module default to the winner, build the trained-weights engine,
   measure dispatch-only + depth-2 pipelined predict_case (r12 protocol).
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import deque
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--e2e-iters", type=int, default=8)
    ap.add_argument("--skip-e2e", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import att_aspp_unet_tpu.ops.clahe as clahe_mod
    from att_aspp_unet_tpu.ops.clahe import clahe

    wall0 = time.time()
    print(f"[r16] backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jax.device_put((rng.random((140, 562, 744)) * 255).astype(np.uint8))
    x.block_until_ready()

    def timeit(fn):
        fn()                                   # compile + warm
        warm_at = time.time() - wall0
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2], warm_at

    outs = {}
    for impl in ("onehot_bf16", "onehot_int8", "nibble"):
        def run(impl=impl):
            return float(jnp.sum(clahe(x, 1.0, (8, 8), impl=impl)
                                 .astype(jnp.float32)))
        try:
            med, warm_at = timeit(run)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"[r16] clahe {impl}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        outs[impl] = med
        print(f"[r16] clahe {impl}: {med*1e3:.1f} ms  [warm +{warm_at:.0f}s]")

    if "onehot_bf16" in outs:
        base = np.asarray(clahe(x, 1.0, (8, 8), impl="onehot_bf16"))
        for impl in outs:
            o = np.asarray(clahe(x, 1.0, (8, 8), impl=impl))
            d = np.abs(o.astype(int) - base.astype(int)).max()
            print(f"[r16] {impl} vs bf16: max|diff|={d}")

    winner = min(outs, key=outs.get) if outs else "onehot_bf16"
    print(f"[r16] winner: {winner}")
    if args.skip_e2e:
        return 0

    # ---- e2e with the winner as default (trace-time resolution) ----
    clahe_mod._DEFAULT_IMPL = winner
    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    cfg = Config(preprocess=PreprocessConfig(),
                 model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=16))
    syn = Path(__file__).resolve().parent.parent / "resources/synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    engine = AttAsppEngine(cfg, variables)
    import json
    thr = float(json.loads((syn / "thr.json").read_text())["best_thr"])
    sweep = jax.device_put((rng.random((140, 562, 744)) * 255)
                           .astype(np.uint8))
    sweep.block_until_ready()

    t0 = time.time()
    engine.predict_case_collect(engine.predict_case_submit(sweep, thr),
                                (0.28, 0.28))
    print(f"[r16] e2e compile+warm {time.time() - t0:.1f}s "
          f"[wall +{time.time() - wall0:.0f}s]", file=sys.stderr)

    n = args.e2e_iters
    handles = []
    t0 = time.time()
    for _ in range(n):
        handles.append(engine.predict_case_submit(sweep, thr))
    jax.block_until_ready(handles[-1][:2])
    _ = float(jnp.sum(handles[-1][0].astype(jnp.int32)))
    disp = (time.time() - t0) / n
    print(f"[r16] dispatch-only ({winner}): {disp:.3f} s/sweep "
          f"({140 / disp:.1f} f/s)")
    del handles

    for depth in (1, 2):
        q = deque(engine.predict_case_submit(sweep, thr)
                  for _ in range(depth - 1))
        t0 = time.time()
        for _ in range(n):
            q.append(engine.predict_case_submit(sweep, thr))
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        while q:
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        per = (time.time() - t0) / (n + depth - 1)
        print(f"[r16] depth {depth} ({winner}): {per:.3f} s/sweep "
              f"({140 / per:.1f} f/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
