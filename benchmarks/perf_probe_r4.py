#!/usr/bin/env python
"""Round-2 probes, part 2: why do the 512²/256² small-C stages run 1.6–2.8×
above their lane-adjusted roofline (perf_probe_r3 attribution)?

Isolates the suspect ops at the 144-frame scale (9 tiles × b16, matching the
stage probes) and re-times the fixed batched Pallas CLAHE kernel.  A `null`
probe measures the fixed dispatch+readback overhead of the axon tunnel so
small-op numbers can be interpreted as (run − null).
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    NB, B, S = 9, 16, 512          # 9 tiles of 16 = 144 frames
    rng = np.random.default_rng(0)

    def report(name, compile_s, run_s):
        print(f"{name:24s} compile={compile_s:7.1f}s run={run_s:7.4f}s",
              flush=True)

    def timed(name, run):
        t0 = time.time()
        run()
        report(name, time.time() - t0, _med(run, args.iters))

    # ---------------- null: dispatch + readback overhead -------------------
    def null_exp():
        x = jax.device_put(np.ones((8, 8), np.float32))
        f = jax.jit(lambda x: x + 1.0)
        timed("null", lambda: float(jnp.sum(f(x))))

    # ---------------- tiled conv micro-benchmarks --------------------------
    def tiled(model_fn, cin, name, hw=S):
        """Apply `module` over 9 tiles of (16, hw, hw, cin) under lax.map."""
        mod, vars_ = model_fn()
        x = jax.device_put(
            rng.random((NB, B, hw, hw, cin)).astype(np.float32)
            .astype(jnp.bfloat16))
        x.block_until_ready()

        @jax.jit
        def run_all(v, tiles):
            return jax.lax.map(lambda t: jnp.sum(
                mod.apply(v, t).astype(jnp.float32)), tiles)

        timed(name, lambda: float(jnp.sum(run_all(vars_, x))))

    from att_aspp_unet_tpu.nn.blocks import ConvBNReLU

    class PlainConv(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.feats, (3, 3), padding=1, use_bias=False,
                           dtype=jnp.bfloat16, param_dtype=jnp.float32)(x)

    class CBR(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, x):
            return ConvBNReLU(self.feats)(x, False)

    class Taps(nn.Module):
        """3×3 SAME conv as nine shifted broadcast-FMAs (VPU path; for
        Cin=1 the MXU conv pads the contraction dim 9→128)."""
        feats: int

        @nn.compact
        def __call__(self, x):
            cin = x.shape[-1]
            w = self.param("kernel", nn.initializers.lecun_normal(),
                           (3, 3, cin, self.feats), jnp.float32)
            wb = w.astype(jnp.bfloat16)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            H, W = x.shape[1], x.shape[2]
            out = None
            for i in range(3):
                for j in range(3):
                    sl = jax.lax.dynamic_slice_in_dim(
                        jax.lax.dynamic_slice_in_dim(xp, i, H, 1), j, W, 2)
                    t = jnp.einsum("bhwc,co->bhwo", sl, wb[i, j],
                                   preferred_element_type=jnp.bfloat16)
                    out = t if out is None else out + t
            return out

    def mk(module_cls, feats, cin, hw=S):
        def f():
            mod = module_cls(feats)
            v = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, hw, hw, cin), jnp.bfloat16))
            return mod, v
        return f

    exps = [
        ("null", null_exp),
        ("d10_conv_1to48", lambda: tiled(mk(CBR, 48, 1), 1,
                                         "d10_conv_1to48")),
        ("d10_taps_1to48", lambda: tiled(mk(Taps, 48, 1), 1,
                                         "d10_taps_1to48")),
        ("d11_conv_48to48", lambda: tiled(mk(PlainConv, 48, 48), 48,
                                          "d11_conv_48to48")),
        ("d11_conv_48to128", lambda: tiled(mk(PlainConv, 128, 48), 48,
                                           "d11_conv_48to128")),
        ("d11_conv_128to128", lambda: tiled(mk(PlainConv, 128, 128), 128,
                                            "d11_conv_128to128")),
        ("u1_conv_96to48", lambda: tiled(mk(PlainConv, 48, 96), 96,
                                         "u1_conv_96to48")),
        ("d2_conv_96to96", lambda: tiled(mk(PlainConv, 96, 96), 96,
                                         "d2_conv_96to96", hw=256)),
    ]

    # ---------------- fixed Pallas CLAHE ------------------------------------
    def clahe_exp():
        from att_aspp_unet_tpu.ops.clahe import clahe
        H, W = 562, 744
        sweep = jax.device_put(
            (rng.random((140, H, W)) * 255).astype(np.uint8))
        sweep.block_until_ready()
        run = lambda: float(jnp.sum(
            clahe(sweep, 1.0, (8, 8), use_pallas=True).astype(jnp.int32)))
        timed("clahe_pallas_batched", run)

    exps.append(("clahe_pallas_batched", clahe_exp))

    for name, fn in exps:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
