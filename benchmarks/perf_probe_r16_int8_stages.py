"""Probe r16 — int8 direct conv across EVERY flagship stage shape (B=16).

Probe r15b saw int8 conv_general_dilated run x1.85 vs bf16 at the
dominant (512², C48) shape with no layout games — but x0.91 at B=8 on
(256², C96).  Before building a quantized serving mode, measure the
bf16→int8 ratio for the whole encoder/decoder shape set at the engine's
micro-batch (16), plus the 1×1 convs of the attention gates, to bound
the end-to-end speedup a post-training-quantized forward could deliver.

Timing: K-iteration on-device chained loop (single dispatches are pure
tunnel latency — see perf_probe_r15_int8).
"""

from __future__ import annotations

import argparse
import sys
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
    print(f"[r16] backend={jax.default_backend()} B={args.batch}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    B = args.batch

    shapes = (
        # label, H, Cin, Cout, kernel
        ("enc d1  48->48 @512", 512, 48, 48, 3),
        ("enc d2  96->96 @256", 256, 96, 96, 3),
        ("enc d3 192->192@128", 128, 192, 192, 3),
        ("enc d4 384->384@ 64", 64, 384, 384, 3),
        ("dec u1  96->48 @512", 512, 96, 48, 3),
        ("dec u2 192->96 @256", 256, 192, 96, 3),
        ("dec u3 384->192@128", 128, 384, 192, 3),
        ("dec u4 768->384@ 64", 64, 768, 384, 3),
    )

    tot_bf = tot_i8 = 0.0
    for label, H, Ci, Co, k in shapes:
        def make(dtype):
            x = jnp.asarray(
                rng.integers(-127, 127, (B, H, H, Ci)) if dtype == jnp.int8
                else rng.standard_normal((B, H, H, Ci)), dtype)
            w = jnp.asarray(
                rng.integers(-127, 127, (k, k, Ci, Co)) if dtype == jnp.int8
                else rng.standard_normal((k, k, Ci, Co)), dtype)
            return x, w

        def conv(a, b):
            dn = lax.conv_dimension_numbers(a.shape, b.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
            return lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                            dimension_numbers=dn,
                                            preferred_element_type=acc)

        # Cout != Cin: feed back by tiling channels (same op both dtypes)
        rs = (None if Ci == Co else
              (lambda o: jnp.concatenate([o] * (Ci // Co), axis=-1)))
        x, w = make(jnp.bfloat16)
        tb = timed(loop_op(conv, reshape=rs), x, w,
                   iters=args.iters) / (K + 1)
        x, w = make(jnp.int8)
        ti = timed(loop_op(conv, reshape=rs), x, w,
                   iters=args.iters) / (K + 1)
        flop = 2 * B * H * H * k * k * Ci * Co / 1e12
        tot_bf += tb
        tot_i8 += ti
        print(f"[r16] {label} bf16 {tb*1e3:6.2f} ms ({flop/tb:5.1f} TF/s)"
              f"   int8 {ti*1e3:6.2f} ms ({flop/ti:5.1f} Top/s)"
              f"   x{tb/ti:4.2f}")

    print(f"[r16] conv-stage total (1 conv per listed shape; the model has"
          f" ~2x each): bf16 {tot_bf*1e3:.1f} ms  int8 {tot_i8*1e3:.1f} ms"
          f"  x{tot_bf/tot_i8:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
