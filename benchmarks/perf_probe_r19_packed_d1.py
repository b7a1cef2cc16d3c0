"""Probe r19 — a fully stage-resident width-packed d1 encoder stage.

The w2d lowering loses as a per-conv drop-in because pack/unpack are
physical relayouts (NOTES.md r15c autopsy).  The d1 stage is the unique
place where BOTH boundaries fold away:

- pack-in is FREE: the 1→C input conv emits the packed layout directly as
  a stride-(1,2) conv with a width-4 kernel (each packed cell holds the
  two output columns its window covers);
- unpack-out is FREE: maxpool(2,2)'s width window is exactly the packed
  cell, so pooling becomes ``max(x[..., :C], x[..., C:])`` + an h-pool,
  and the result is ALREADY the unpacked d2 input.

Between them the 48→48 conv runs at 96 packed lanes (the r15c win region)
with BN affine tiled ([s, s]) and ReLU applied in packed space.

This probe (a) asserts exactness vs the direct d1 stage, (b) times both
with FRESH-layout inputs per iteration (the r18d methodology — chained
resident loops overstate packed wins).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(C: int, jnp, lax):
    def affine(y, s, b):
        return jnp.maximum(y * s + b, 0.0)

    def conv(x, w, stride=(1, 1), pad="SAME"):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(x, w, stride, pad,
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)

    def d1_direct(x, k0, a0, k1, a1, dt):
        y = affine(conv(x.astype(dt), k0.astype(dt)), *a0)
        y = affine(conv(y.astype(dt), k1.astype(dt)), *a1)
        n, h, w, c = y.shape
        return y.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))

    def pack_in_weight(k0):
        # (3, 3, ci, C) → (3, 4, ci, 2C): out cell (h, w', p·C+co) is the
        # original output column 2w'+p; window cols 2w'-1+e, e∈0..3 with
        # left pad 1 ⇒ W[:, p+j, :, p·C+co] = k0[:, j, :, co]
        _, _, ci, co = k0.shape
        w = jnp.zeros((3, 4, ci, 2 * co), k0.dtype)
        for p in (0, 1):
            for j in range(3):
                w = w.at[:, p + j, :, p * co:(p + 1) * co].add(k0[:, j])
        return w

    def d1_packed(x, k0, a0, k1, a1, dt):
        from att_aspp_unet_tpu.nn.w2d import w2d_pack_weight

        k0p = pack_in_weight(k0).astype(dt)
        k1p = w2d_pack_weight(k1).astype(dt)
        s0 = jnp.concatenate([a0[0], a0[0]])
        b0 = jnp.concatenate([a0[1], a0[1]])
        s1 = jnp.concatenate([a1[0], a1[0]])
        b1 = jnp.concatenate([a1[1], a1[1]])
        y = conv(x.astype(dt), k0p, stride=(1, 2),
                 pad=((1, 1), (1, 1)))                  # (B, H, W/2, 2C)
        y = affine(y, s0, b0)
        y = affine(conv(y.astype(dt), k1p), s1, b1)      # packed 48→48
        wmax = jnp.maximum(y[..., :C], y[..., C:])       # width pool = cell
        n, h, w2, c = wmax.shape
        return wmax.reshape(n, h // 2, 2, w2, c).max(axis=2)

    # ---- u1 stage: concat(skip, upsampled) → conv(2C→C) → conv(C→C) ----
    # In the packed plan both inputs arrive packed (skip from the packed
    # d1, g emitted packed by the transposed conv), so the packed concat
    # holds channel groups [skip_p0, skip_p1, g_p0, g_p1]·C and the conv0
    # weight is the w2d packing of the (3,3,2C,C) kernel with its input
    # channels permuted to match.

    def u1_direct(skip, g, k0, a0, k1, a1, dt):
        x = jnp.concatenate([skip, g], axis=-1).astype(dt)
        y = affine(conv(x, k0.astype(dt)), *a0)
        return affine(conv(y.astype(dt), k1.astype(dt)), *a1)

    def u1_packed(sp, gp, k0, a0, k1, a1, dt):
        """Inputs arrive PACKED (in the real plan upstream producers emit
        packed); the concat's group order [s_p0, s_p1, g_p0, g_p1] is
        absorbed into the kernel's input-channel permutation — free at
        trace time, no activation shuffle."""
        from att_aspp_unet_tpu.nn.w2d import w2d_pack_weight

        xp = jnp.concatenate([sp, gp], axis=-1)
        k0p = w2d_pack_weight(k0)  # (3,3,4C,2C); expects [s_p0,g_p0,s_p1,g_p1]
        pk = np.concatenate([np.arange(0, C), np.arange(2 * C, 3 * C),
                             np.arange(C, 2 * C), np.arange(3 * C, 4 * C)])
        k0p = k0p[:, :, pk, :]     # consume [s_p0, s_p1, g_p0, g_p1]
        s0 = jnp.concatenate([a0[0], a0[0]])
        b0 = jnp.concatenate([a0[1], a0[1]])
        s1 = jnp.concatenate([a1[0], a1[0]])
        b1 = jnp.concatenate([a1[1], a1[1]])
        y = affine(conv(xp.astype(dt), k0p.astype(dt)), s0, b0)
        k1p = w2d_pack_weight(k1)
        y = affine(conv(y.astype(dt), k1p.astype(dt)), s1, b1)
        return y

    return d1_direct, d1_packed, u1_direct, u1_packed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cpu-check", action="store_true",
                    help="exactness only, tiny shapes, CPU backend")
    args = ap.parse_args()

    if args.cpu_check:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    if args.cpu_check:
        B, H, C = 2, 16, 4
    else:
        B, H, C = args.batch, 512, 48
    print(f"[r19] backend={jax.default_backend()} B={B} H={H} C={C}",
          file=sys.stderr)

    d1_direct, d1_packed, u1_direct, u1_packed = build(C, jnp, lax)
    x = jnp.asarray(rng.random((B, H, H, 1)), jnp.float32)
    k0 = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.3, jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
    a0 = (jnp.asarray(rng.random(C) + 0.5, jnp.float32),
          jnp.asarray(rng.random(C) - 0.5, jnp.float32))
    a1 = (jnp.asarray(rng.random(C) + 0.5, jnp.float32),
          jnp.asarray(rng.random(C) - 0.5, jnp.float32))
    skip = jnp.asarray(rng.random((B, H, H, C)), jnp.float32)
    gup = jnp.asarray(rng.random((B, H, H, C)), jnp.float32)
    ku0 = jnp.asarray(rng.standard_normal((3, 3, 2 * C, C)) * 0.1,
                      jnp.float32)
    ku1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)

    dt = jnp.float32 if args.cpu_check else jnp.bfloat16
    yd = np.asarray(jax.jit(lambda *t: d1_direct(*t, dt))(x, k0, a0, k1, a1))
    yp = np.asarray(jax.jit(lambda *t: d1_packed(*t, dt))(x, k0, a0, k1, a1))
    err = np.abs(yd - yp).max() / (np.abs(yd).max() + 1e-9)
    sp = jnp.asarray(np.asarray(skip).reshape(B, H, H // 2, 2 * C))
    gp = jnp.asarray(np.asarray(gup).reshape(B, H, H // 2, 2 * C))
    ud = np.asarray(jax.jit(lambda *t: u1_direct(*t, dt))(
        skip, gup, ku0, a0, ku1, a1))
    up_ = np.asarray(jax.jit(lambda *t: u1_packed(*t, dt))(
        sp, gp, ku0, a0, ku1, a1)).reshape(ud.shape)
    erru = np.abs(ud - up_).max() / (np.abs(ud).max() + 1e-9)
    tol = 1e-5 if dt == jnp.float32 else 2e-2
    print(f"[r19] exactness d1 {err:.2e} u1 {erru:.2e} "
          f"({'OK' if max(err, erru) < tol else 'FAIL'})", file=sys.stderr)
    if args.cpu_check:
        return 0 if max(err, erru) < 1e-5 else 1

    K = args.k

    def loopK(body):
        def fn(x0, *rest):
            def it(i, carry):
                out = body(x0 + carry * 1e-30, *rest, dt)
                return carry + jnp.sum(out).astype(jnp.float32) * 1e-30
            return lax.fori_loop(0, K, it, jnp.float32(0.0))
        return fn

    def timed(fn, *xs):
        f = jax.jit(fn)
        float(jnp.sum(f(*xs)))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(jnp.sum(f(*xs)))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    tb = timed(loopK(d1_direct), x, k0, a0, k1, a1) / K
    tp = timed(loopK(d1_packed), x, k0, a0, k1, a1) / K
    print(f"[r19] d1 stage fresh-layout: direct {tb*1e3:7.2f} ms  packed "
          f"{tp*1e3:7.2f} ms  x{tb/tp:4.2f}", file=sys.stderr)

    # u1: direct consumes (skip, g); packed consumes the packed pair —
    # the loop perturbs only the first input, identical work both sides
    tbu = timed(loopK(lambda a, *r: u1_direct(a, *r)),
                skip, gup, ku0, a0, ku1, a1) / K
    tpu = timed(loopK(lambda a, *r: u1_packed(a, *r)),
                sp, gp, ku0, a0, ku1, a1) / K
    print(f"[r19] u1 stage fresh-layout: direct {tbu*1e3:7.2f} ms  packed "
          f"{tpu*1e3:7.2f} ms  x{tbu/tpu:4.2f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
