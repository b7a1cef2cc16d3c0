#!/usr/bin/env python
"""Round-2 probe, part 7: per-shape Mosaic compile check of fused_double_cbr.

Compiles each distinct (cin, cmid, cout, HW) pair the fast forward uses, one
at a time with a tiny batch, so Mosaic failures name the culprit shape.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    ("d1", 1, 48, 48, 512),
    ("d2", 48, 96, 96, 256),
    ("d3", 96, 192, 192, 128),
    ("u3", 384, 192, 192, 128),
    ("u2", 192, 96, 96, 256),
    ("u1", 96, 48, 48, 512),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.ops.pallas.fused_conv import (fused_double_cbr,
                                                         pack_conv_weight)

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    N = args.frames

    for name, cin, cmid, cout, hw in SHAPES:
        if only and name not in only:
            continue
        try:
            w1 = pack_conv_weight(jnp.asarray(
                rng.standard_normal((3, 3, cin, cmid)) * 0.05, jnp.float32))
            w2 = pack_conv_weight(jnp.asarray(
                rng.standard_normal((3, 3, cmid, cout)) * 0.05, jnp.float32))
            s1 = jnp.ones(cmid); b1 = jnp.zeros(cmid)
            s2 = jnp.ones(cout); b2 = jnp.zeros(cout)
            x = jax.device_put(rng.standard_normal(
                (N, cin, hw, hw)).astype(np.float32).astype(jnp.bfloat16))
            x.block_until_ready()

            @jax.jit
            def run(x):
                return jnp.sum(fused_double_cbr(
                    x, w1, s1, b1, w2, s2, b2).astype(jnp.float32))

            t0 = time.time()
            v = float(run(x))
            comp = time.time() - t0
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                float(run(x))
                ts.append(time.time() - t0)
            med = sorted(ts)[len(ts) // 2]
            gflop = 2 * 9 * hw * hw * (cin * cmid + cmid * cout) * N / 1e9
            print(f"{name:4s} cin={cin:3d} hw={hw:3d} compile={comp:6.1f}s "
                  f"run={med:8.5f}s {gflop / med / 1000:6.2f} TF/s "
                  f"sum={v:.1f}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:4s} FAILED: {type(e).__name__}: {msg}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
