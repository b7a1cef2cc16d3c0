"""Probe r15 — does int8 buy MXU throughput on v5e, and does XLA keep it
for convs?

The v5e MXU is spec'd at 2x int8 ops vs bf16 (394 vs 197 TOPS).  The
flagship forward is conv-dominated (probe r5: plain enc/dec convs are 82 %
of forward time at 35-41 % bf16 MFU), so IF

1. a pure int8 `dot_general` actually sustains ~2x the bf16 matmul rate, and
2. `conv_general_dilated` with int8 operands lowers to that same MXU path
   (not an upcast),

then a post-training-quantized inference mode could lift the e2e sweep
number well past the bf16 ceiling argument (NOTES.md round-2 MFU section).
This probe answers both questions before any quantization code is written.

Matrix:
  a. dot_general 4096^2 x 4096^2: bf16/f32acc vs int8/int32acc vs int4.
  b. conv3x3 NHWC at the flagship's dominant shapes (512^2 C48->48,
     256^2 C96->96): bf16 vs int8-operands/int32-acc.
  c. same conv expressed as an explicit im2col matmul in int8 — fallback
     plan if the direct conv de-quantizes to bf16 under the hood.

All shapes compile in THIS process (cross-process compile caching through
the remote service is unreliable — NOTES.md).  Timing: forced scalar
readback, median of --iters (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, iters=5):
    """Median seconds per call; `fn` must already amortize dispatch by
    looping its op K times on device (a single dispatch is ~35-50 ms of
    axon-tunnel latency — probe r15's first run measured exactly that and
    nothing else)."""
    import jax.numpy as jnp

    out = fn(*args)                        # compile
    _ = float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.time() - t0)
    return float(np.median(ts))


K = 64  # on-device repeats per dispatch


def loop_op(op, reshape=None):
    """jit(x, y) running `op` K+1 times chained (each iteration's output is
    cast back to x's dtype and fed forward, so XLA cannot hoist or elide
    the loop).  Requires op(x, y) shape-compatible with x (`reshape` maps
    it back when not)."""
    import jax
    from jax import lax

    def body(_, carry):
        x, y = carry
        o = op(x, y)
        if reshape is not None:
            o = reshape(o)
        return (o.astype(x.dtype), y)

    @jax.jit
    def run(x, y):
        x, y = lax.fori_loop(0, K, body, (x, y))
        return op(x, y)

    return run


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"[r15] backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)

    # ---- a. pure matmul rates ------------------------------------------
    N = 4096
    flop = 2 * N * N * N / 1e12            # TFLOP (or Tops for int)
    a_f = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    b_f = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    a_i = jnp.asarray(rng.integers(-127, 127, (N, N)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-127, 127, (N, N)), jnp.int8)

    mm_bf = loop_op(lambda x, y: lax.dot(
        x, y, preferred_element_type=jnp.float32))
    mm_i8 = loop_op(lambda x, y: lax.dot(
        x, y, preferred_element_type=jnp.int32))
    t_bf = timed(mm_bf, a_f, b_f, iters=args.iters) / (K + 1)
    t_i8 = timed(mm_i8, a_i, b_i, iters=args.iters) / (K + 1)
    print(f"[r15a] matmul {N}^3  bf16 {t_bf*1e3:7.2f} ms ({flop/t_bf:6.1f} TF/s)"
          f"   int8 {t_i8*1e3:7.2f} ms ({flop/t_i8:6.1f} Top/s)"
          f"   speedup x{t_bf/t_i8:.2f}")

    # ---- b. direct conv3x3 at flagship shapes ---------------------------
    for (B, H, C) in ((8, 512, 48), (8, 256, 96)):
        x_f = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
        w_f = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
        x_i = jnp.asarray(rng.integers(-127, 127, (B, H, H, C)), jnp.int8)
        w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
        dn = lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        cflop = 2 * B * H * H * 9 * C * C / 1e12

        conv_bf = loop_op(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32))
        conv_i8 = loop_op(lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32))
        t_cbf = timed(conv_bf, x_f, w_f, iters=args.iters) / (K + 1)
        try:
            t_ci8 = timed(conv_i8, x_i, w_i, iters=args.iters) / (K + 1)
            msg = (f"int8 {t_ci8*1e3:7.2f} ms ({cflop/t_ci8:6.1f} Top/s)"
                   f"   speedup x{t_cbf/t_ci8:.2f}")
        except Exception as e:  # pragma: no cover - probe
            msg = f"int8 FAILED: {type(e).__name__}: {e}"
        print(f"[r15b] conv3x3 {B}x{H}^2xC{C}  bf16 {t_cbf*1e3:7.2f} ms "
              f"({cflop/t_cbf:6.1f} TF/s)   {msg}")

    # ---- c. conv as im2col matmul (int8 fallback plan) ------------------
    B, H, C = 8, 512, 48
    x_i = jnp.asarray(rng.integers(-127, 127, (B, H, H, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
    cflop = 2 * B * H * H * 9 * C * C / 1e12

    def im2col(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # (B,H,W,9C): stack the 9 taps along channels, one big matmul
        cols = jnp.concatenate(
            [xp[:, dy:dy + H, dx:dx + H, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        return lax.dot_general(
            cols.reshape(-1, 9 * C), w.reshape(9 * C, C),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    im2col_i8 = loop_op(im2col, reshape=lambda o: o.reshape(B, H, H, C))
    try:
        t_im = timed(im2col_i8, x_i, w_i, iters=args.iters) / (K + 1)
        print(f"[r15c] im2col-int8 conv3x3 {B}x{H}^2xC{C}  {t_im*1e3:7.2f} ms "
              f"({cflop/t_im:6.1f} Top/s)")
    except Exception as e:  # pragma: no cover - probe
        print(f"[r15c] im2col-int8 FAILED: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
