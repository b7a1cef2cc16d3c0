"""Probe r15b — can the 512^2 x C48 stage escape its 9.5 % MFU?

Probe r15 measured the flagship's dominant conv shape (512^2, C48->48) at
18.8 TF/s bf16 — 9.5 % MFU — while the SAME conv at 256^2 x C96 runs
51.6 TF/s.  C=48 fills only 48 of the MXU's 128 lanes; deeper stages fill
them.  Two classic lowerings trade redundant FLOPs for lane occupancy:

  - width-to-depth (w2d): x(H, W, C) -> x'(H, W/2, 2C); a 3x3 stride-1
    conv becomes a dense 3x3 conv at 2C channels (the true weight has a
    2x2-block sparsity pattern XLA can't exploit, so 2x the FLOPs);
  - space-to-depth (s2d): x -> (H/2, W/2, 4C), dense 3x3 at 4C = 4x FLOPs.

The question is whether the MFU gain beats the FLOP inflation at the
ACTUAL shapes, in bf16 and int8.  Timing uses the K-iteration on-device
loop from probe r15 (single dispatches are pure tunnel latency).  Weight
mapping correctness is not needed for timing; the lowering is exact in
principle (each output sub-position reads a fixed tap subset).

Effective speedup = t_bf16_direct / (t_variant) regardless of the
variant's inflated FLOPs — what matters is wall time for the same
original work.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from perf_probe_r15_int8 import K, loop_op, timed  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"[r15b] backend={jax.default_backend()} B={args.batch}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    B = args.batch
    # original work: one 3x3 conv, 512^2, C48->48, per-batch
    base_flop = 2 * B * 512 * 512 * 9 * 48 * 48 / 1e12

    def conv(dtype, acc, Bv, H, W, C):
        x = jnp.asarray(
            rng.integers(-127, 127, (Bv, H, W, C)) if dtype == jnp.int8
            else rng.standard_normal((Bv, H, W, C)), dtype)
        w = jnp.asarray(
            rng.integers(-127, 127, (3, 3, C, C)) if dtype == jnp.int8
            else rng.standard_normal((3, 3, C, C)), dtype)
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        fn = loop_op(lambda a, b: lax.conv_general_dilated(
            a, b, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=acc))
        return timed(fn, x, w, iters=args.iters) / (K + 1)

    variants = (
        # label, H, W, C, flop multiplier vs the original conv
        ("direct 512x512xC48 ", 512, 512, 48, 1),
        ("w2d    512x256xC96 ", 512, 256, 96, 2),
        ("s2d    256x256xC192", 256, 256, 192, 4),
    )
    t0 = None
    for label, H, W, C, mult in variants:
        tb = conv(jnp.bfloat16, jnp.float32, B, H, W, C)
        ti = conv(jnp.int8, jnp.int32, B, H, W, C)
        if t0 is None:
            t0 = tb
        print(f"[r15b] {label} bf16 {tb*1e3:6.2f} ms "
              f"({base_flop*mult/tb:5.1f} TF/s, eff x{t0/tb:4.2f})   "
              f"int8 {ti*1e3:6.2f} ms (eff x{t0/ti:4.2f})")

    # int4 matmul — does v5e expose a 4-bit MXU rate at all?
    N = 4096
    flop = 2 * N ** 3 / 1e12
    try:
        a4 = jnp.asarray(rng.integers(-7, 7, (N, N)), jnp.int4)
        b4 = jnp.asarray(rng.integers(-7, 7, (N, N)), jnp.int4)
        mm4 = loop_op(lambda x, y: lax.dot(
            x, y, preferred_element_type=jnp.int32))
        t4 = timed(mm4, a4, b4, iters=args.iters) / (K + 1)
        print(f"[r15b] matmul 4096^3 int4 {t4*1e3:6.2f} ms "
              f"({flop/t4:6.1f} Top/s)")
    except Exception as e:  # pragma: no cover - probe
        print(f"[r15b] int4 matmul unsupported: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
