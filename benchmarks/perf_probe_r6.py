#!/usr/bin/env python
"""Round-2 probes, part 4: fused double-CBR Pallas kernel vs the XLA pair.

Times the shapes that dominate the forward pass (probe r3 attribution:
decoder 62 %, u1 129 ms / u2 77 ms of ~0.5 s at b16):

- pair48_xla / pair48_fused: two chained 3×3 convs 48→48 @ 512², 144 frames
  (the d1/u1 inner pair; XLA single conv measured 71 ms net → pair ~142 ms).
- pair96_xla / pair96_fused: 192→96→96 @ 256² (the u2 pair after concat).
- enc1_fused: 1→48→48 @ 512² (the input pair; K=9 first conv).

Prints: name  compile_s  median_run_s.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _med(f, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--frames", type=int, default=144)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.ops.pallas.fused_conv import (
        fused_double_cbr, pack_conv_weight)

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    N = args.frames
    rng = np.random.default_rng(0)

    def report(name, compile_s, run_s):
        print(f"{name:16s} compile={compile_s:7.1f}s run={run_s:7.4f}s",
              flush=True)

    def timed(name, run):
        t0 = time.time()
        run()
        report(name, time.time() - t0, _med(run, args.iters))

    def mk_pair(cin, cmid, cout, hw, tile=16):
        w1 = (rng.standard_normal((3, 3, cin, cmid)) * 0.05).astype(
            np.float32)
        w2 = (rng.standard_normal((3, 3, cmid, cout)) * 0.05).astype(
            np.float32)
        s1 = np.ones(cmid, np.float32)
        b1 = np.zeros(cmid, np.float32)
        s2 = np.ones(cout, np.float32)
        b2 = np.zeros(cout, np.float32)
        return w1, s1, b1, w2, s2, b2

    def fused_exp(name, cin, cmid, cout, hw):
        w1, s1, b1, w2, s2, b2 = mk_pair(cin, cmid, cout, hw)
        x = jax.device_put(rng.standard_normal((N, cin, hw, hw))
                           .astype(np.float32).astype(jnp.bfloat16))
        x.block_until_ready()
        p1, p2 = pack_conv_weight(jnp.asarray(w1)), \
            pack_conv_weight(jnp.asarray(w2))
        a1, a2 = map(jnp.asarray, (s1, s2))
        o1, o2 = map(jnp.asarray, (b1, b2))

        @jax.jit
        def run_all(x):
            return jnp.sum(
                fused_double_cbr(x, p1, a1, o1, p2, a2, o2)
                .astype(jnp.float32))

        timed(name, lambda: float(run_all(x)))

    def xla_exp(name, cin, cmid, cout, hw, tile=16):
        w1, s1, b1, w2, s2, b2 = mk_pair(cin, cmid, cout, hw)
        x = jax.device_put(rng.standard_normal((N // tile, tile, hw, hw, cin))
                           .astype(np.float32).astype(jnp.bfloat16))
        x.block_until_ready()
        k1 = jnp.asarray(w1).astype(jnp.bfloat16)
        k2 = jnp.asarray(w2).astype(jnp.bfloat16)

        def cbr(h, k, s, b):
            y = jax.lax.conv_general_dilated(
                h, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y * s + b, 0.0).astype(jnp.bfloat16)

        @jax.jit
        def run_all(x):
            def one(t):
                h = cbr(t, k1, jnp.asarray(s1), jnp.asarray(b1))
                return jnp.sum(cbr(h, k2, jnp.asarray(s2), jnp.asarray(b2))
                               .astype(jnp.float32))
            return jnp.sum(jax.lax.map(one, x))

        timed(name, lambda: float(run_all(x)))

    exps = [
        ("pair48_xla", lambda: xla_exp("pair48_xla", 48, 48, 48, 512)),
        ("pair48_fused", lambda: fused_exp("pair48_fused", 48, 48, 48, 512)),
        ("pair96_xla", lambda: xla_exp("pair96_xla", 192, 96, 96, 256)),
        ("pair96_fused", lambda: fused_exp("pair96_fused", 192, 96, 96,
                                           256)),
        ("enc1_fused", lambda: fused_exp("enc1_fused", 1, 48, 48, 512)),
    ]

    for name, fn in exps:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
