"""Probe r18d — which SUBGRAPH kills the int8 win (r18b: ×0.74 in-graph
while every conv wins isolated, r16/r18c)?

Times hand-built inference subgraphs (conv → folded-BN affine → ReLU, the
exact serving math) in bf16 vs int8-PTQ form, K-looped on-device with a
scalar data dependence (fresh input layout each iteration — the in-model
case, unlike r16's layout-resident feedback):

  enc512:  d1 pair (1→48, 48→48 @512²) + maxpool
  encall:  d1..d4 pairs with maxpools (the whole encoder)
  dec512:  u1 stage (up-transpose 96→48 bf16, concat skip, 96→48, 48→48)

Whichever variant reproduces the ×0.74 slowdown localises the fusion or
layout failure.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"[r18d] backend={jax.default_backend()} B={args.batch} "
          f"K={args.k}", file=sys.stderr)
    rng = np.random.default_rng(0)
    B, K = args.batch, args.k

    def mkw(ci, co, k=3):
        return jnp.asarray(rng.standard_normal((k, k, ci, co)) * 0.1,
                           jnp.float32)

    def mkaff(c):
        return (jnp.asarray(rng.random(c) + 0.5, jnp.float32),
                jnp.asarray(rng.random(c), jnp.float32))

    def conv(x, w, acc=jnp.float32):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        preferred_element_type=acc)

    def cbr_bf16(x, w, aff):
        y = conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
        return jnp.maximum(y * aff[0] + aff[1], 0.0).astype(jnp.bfloat16)

    def cbr_int8(x, w, aff, s_x):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        wa = jnp.max(jnp.abs(w), axis=(0, 1, 2))
        s_w = jnp.maximum(wa, 1e-12) / 127.0
        wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        y = conv(xq, wq, acc=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w) * aff[0] + aff[1]
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    def pool(x):
        n, h, w, c = x.shape
        return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))

    chans = [(1, 48), (48, 96), (96, 192), (192, 384)]
    Ws = [(mkw(ci, co), mkw(co, co)) for ci, co in chans]
    As = [(mkaff(co), mkaff(co)) for _, co in chans]

    def encoder(x, mode, depth):
        s = jnp.float32(2.0 / 127.0)
        for i in range(depth):
            (w0, w1), (a0, a1) = Ws[i], As[i]
            if mode == "int8":
                x = cbr_int8(x, w0, a0, s)
                x = cbr_int8(x, w1, a1, s)
            else:
                x = cbr_bf16(x, w0, a0)
                x = cbr_bf16(x, w1, a1)
            x = pool(x)
        return x

    wu = jnp.asarray(rng.standard_normal((2, 2, 96, 48)) * 0.1, jnp.float32)
    wd0, wd1 = mkw(96, 48), mkw(48, 48)
    ad0, ad1 = mkaff(48), mkaff(48)

    def dec512(g, skip, mode):
        # ConvTranspose(2,2) stays bf16 in both modes (as in the engine)
        t = jnp.einsum("nhwc,uvco->nhuwvo", g.astype(jnp.bfloat16),
                       wu.astype(jnp.bfloat16))
        n, h, _, w, _, o = t.shape
        up = t.reshape(n, 2 * h, 2 * w, o)
        x = jnp.concatenate([skip, up], axis=-1)
        s = jnp.float32(2.0 / 127.0)
        if mode == "int8":
            x = cbr_int8(x, wd0, ad0, s)
            x = cbr_int8(x, wd1, ad1, s)
        else:
            x = cbr_bf16(x, wd0, ad0)
            x = cbr_bf16(x, wd1, ad1)
        return x

    def timed(fn, *xs):
        f = jax.jit(fn)
        float(jnp.sum(f(*xs)))  # compile+warm
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(jnp.sum(f(*xs)))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    def loopK(body):
        def fn(*xs):
            def it(i, carry):
                out = body(xs[0] + carry * 1e-30, *xs[1:])
                return carry + jnp.sum(out).astype(jnp.float32) * 1e-30
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return fn

    x512 = jnp.asarray(rng.random((B, 512, 512, 1)), jnp.float32)
    for label, depth in (("enc512 d1-only", 1), ("encall d1..d4", 4)):
        tb = timed(loopK(lambda x: encoder(x, "bf16", depth)), x512) / K
        ti = timed(loopK(lambda x: encoder(x, "int8", depth)), x512) / K
        print(f"[r18d] {label}: bf16 {tb*1e3:7.2f} ms  int8 {ti*1e3:7.2f} ms"
              f"  x{tb/ti:4.2f}", file=sys.stderr)

    g = jnp.asarray(rng.random((B, 256, 256, 96)), jnp.float32)
    # NOTE: skip must be an ARGUMENT — closure-captured it becomes a 400 MB
    # program constant and the remote compile service rejects it (HTTP 413)
    skip = jnp.asarray(rng.random((B, 512, 512, 48)), jnp.bfloat16)
    tb = timed(loopK(lambda a, s: dec512(a, s, "bf16")), g, skip) / K
    ti = timed(loopK(lambda a, s: dec512(a, s, "int8")), g, skip) / K
    print(f"[r18d] dec512 u1-stage: bf16 {tb*1e3:7.2f} ms  int8 "
          f"{ti*1e3:7.2f} ms  x{tb/ti:4.2f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
