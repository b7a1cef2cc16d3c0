"""Probe r16b — does the int8 win survive the quantize/dequantize chain?

r16 timed bare int8 convs (x1.23-1.91 per stage, x1.51 total).  A real
post-training-quantized block is

    x_bf16 --(scale, round, clip, cast)--> x_i8
    conv_i8 -> y_i32 --(x s_x*s_w[co], BN, ReLU)--> bf16

The elementwise quant/dequant ops are VPU passes over HBM-sized tensors;
they must FUSE into the conv's producer/consumer or they eat the MXU
gain.  This probe times the full chain vs the bf16 conv+BN+ReLU chain at
the two shapes that matter most (d1 48ch @512², d2 96ch @256²).
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
    print(f"[r16b] backend={jax.default_backend()} B={args.batch}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    B = args.batch

    for (H, C) in ((512, 48), (256, 96)):
        xf = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.float32)
        scale = jnp.asarray(rng.random(C) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.random(C), jnp.float32)
        dn = lax.conv_dimension_numbers((B, H, H, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

        def chain_bf16(x, w):
            y = lax.conv_general_dilated(x, w.astype(jnp.bfloat16), (1, 1),
                                         "SAME", dimension_numbers=dn)
            y = y.astype(jnp.float32) * scale + bias
            return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

        # static activation scale + per-channel weight scales, as the real
        # quantized block would run (weight quantization folds at trace
        # time for fixed params; here it's in-graph like an engine that
        # quantizes on the fly from the f32 checkpoint)
        s_x = jnp.float32(3.0 / 127.0)
        w_absmax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
        s_w = w_absmax / 127.0
        wq = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)

        def chain_int8(x, w_q):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                          -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(xq, w_q, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s_x * s_w) * scale + bias
            return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

        tb = timed(loop_op(chain_bf16), xf, wf, iters=args.iters) / (K + 1)
        ti = timed(loop_op(chain_int8), xf, wq, iters=args.iters) / (K + 1)
        flop = 2 * B * H * H * 9 * C * C / 1e12
        print(f"[r16b] chain {H}²xC{C}: bf16 {tb*1e3:6.2f} ms "
              f"({flop/tb:5.1f} TF/s)  int8 {ti*1e3:6.2f} ms "
              f"({flop/ti:5.1f} Top/s)  x{tb/ti:4.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
