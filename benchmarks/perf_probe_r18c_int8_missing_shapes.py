"""Probe r18c — int8 vs bf16 for the conv shapes r16 did NOT measure.

r18b showed the int8 forward is slower in-graph (×0.74 single-batch) even
though every r16-measured stage conv wins in isolation.  r16 only timed
the second conv of each encoder pair (Ci==Co) and the decoder pair convs;
the UNmeasured shapes are the channel-expanding first-of-pair convs and
the 1-channel input conv:

    1→48 @512², 48→96 @256², 96→192 @128², 192→384 @64²   (+ the gates'
    1×1 convs stay bf16 by design)

If any of these runs pathologically slow in int8 (Cin=1 cannot tile the
MXU's 128-lane contraction at all), a structural Cin gate on the int8
lowering recovers the win.  Chained-loop timing as r15/r16 (Ci≠Co fed
back by channel slicing — stage-resident layout, same both dtypes).
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
    print(f"[r18c] backend={jax.default_backend()} B={args.batch}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    B = args.batch

    shapes = (
        ("in   1->48 @512", 512, 1, 48, 3),
        ("enc 48->96 @256", 256, 48, 96, 3),
        ("enc 96->192@128", 128, 96, 192, 3),
        ("enc 192->384@64", 64, 192, 384, 3),
    )

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

        rs = lambda o: o[..., :Ci]  # feed Co back as Ci channels
        x, w = make(jnp.bfloat16)
        tb = timed(loop_op(conv, reshape=rs), x, w,
                   iters=args.iters) / (K + 1)
        x, w = make(jnp.int8)
        ti = timed(loop_op(conv, reshape=rs), x, w,
                   iters=args.iters) / (K + 1)
        flop = 2 * B * H * H * k * k * Ci * Co / 1e12
        print(f"[r18c] {label} bf16 {tb*1e3:6.2f} ms ({flop/tb:5.1f} TF/s)"
              f"   int8 {ti*1e3:6.2f} ms ({flop/ti:5.1f} Top/s)"
              f"   x{tb/ti:4.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
