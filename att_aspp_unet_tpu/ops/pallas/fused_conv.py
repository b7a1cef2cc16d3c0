"""Fused double Conv3x3+BN+ReLU Pallas kernel (inference).

Why: probe r3/r4 measured the XLA conv path at ~11 % MFU on the 512²
small-channel stages (48→48 conv: 71 ms net for 1.57 TFLOP — 3.4× above even
the 48/128 lane-adjusted roofline), with each ConvBNReLU writing its full
activation to HBM between the two convs of every encoder/decoder pair.  The
reference runs these as two cuDNN convs (``…stage.py:59-65`` ConvBNReLU,
used in pairs everywhere: ``…stage.py:99-109,113-121``).

This kernel computes a whole ``CBR(CBR(x))`` pair per grid step with the
intermediate activation resident in VMEM:

- layout ``(C, H, W)`` per frame — W on the 128-wide lanes (W % 128 == 0),
  H rows on sublanes, channels as the leading (tile-stacked) dim;
- the 3×3 conv is ONE MXU matmul ``(Cout, 9·Cin) @ (9·Cin, rows·W)`` built
  from nine lane/sublane-shifted views of the input block (the K-stack keeps
  the systolic array's contraction dim full where ``9·Cin ≥ 128``);
- inference BatchNorm is folded to a per-channel scale+bias applied on the
  f32 accumulator, ReLU in-register;
- the input block (with a 2-row halo per conv) is DMA'd from HBM manually;
  only the final pair output is written back.

Semantics match two chained ``Conv2d(k=3, pad=1, bias=False) → BN → ReLU``
exactly: zero padding at frame borders for BOTH convs (conv2's padding is
zeros, not conv1-of-zeros — halo rows outside the frame are masked after
conv1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_STACK_BUDGET = 9 * 1024 * 1024  # bytes allowed for one K-stack buffer


def _xshift(a: jax.Array, d: int) -> jax.Array:
    """Shift the lane (last) dim so column x reads source column x+d,
    zero-filled at the frame edge.  a: (C, rows, W) f32.

    Implemented as a lane rotation + edge mask: Mosaic rejects the obvious
    pad-then-slice (it leaves the value with a nonzero lane offset, and the
    later K-stack concat hits "result/input offset mismatch on non-concat
    dimension").  ``pltpu.roll`` lowers to the native rotate and returns an
    offset-free value — but only for 32-bit element types, hence f32 here.
    """
    if d == 0:
        return a
    W = a.shape[2]
    r = pltpu.roll(a, (-d) % W, axis=2)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
    mask = (col < W - 1) if d == 1 else (col > 0)
    return jnp.where(mask, r, jnp.zeros_like(r))


def _conv3x3(x: jax.Array, w: jax.Array, full_stack: bool):
    """x: (Cin, S, W) bf16.  w: (Cout, 9·Cin) with (dy, dx, ci) K-order.
    Returns f32 (Cout, S·W): output row s is the conv of input rows
    s−1..s+1, so rows 0 and S−1 carry row-wrap garbage — callers compute on
    an 8-aligned halo'd block and slice out the valid center.  All row and
    lane shifts are ``pltpu.roll``s of one f32 copy (offset-free layouts;
    rotate supports only 32-bit data), cast back to bf16 for the MXU."""
    cin, S, W = x.shape
    xf = x.astype(jnp.float32)

    def taps(dy):
        # output row s reads input row s + dy − 1
        base = xf if dy == 1 else pltpu.roll(xf, (1 - dy) % S, axis=1)
        return [_xshift(base, dx - 1).astype(jnp.bfloat16)
                for dx in range(3)]

    if full_stack:
        stack = jnp.concatenate([t for dy in range(3) for t in taps(dy)],
                                axis=0)
        return jax.lax.dot_general(
            w, stack.reshape(9 * cin, S * W),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    wr = w.reshape(w.shape[0], 3, 3 * cin)
    acc = None
    for dy in range(3):
        stack = jnp.concatenate(taps(dy), axis=0)
        part = jax.lax.dot_general(
            wr[:, dy, :], stack.reshape(3 * cin, S * W),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _make_kernel(N, cin, cmid, cout, H, W, R, full1, full2, out_dtype):
    S = R + 8  # 8-aligned DMA block: 2-row true halo + 6 rows of slack

    def kernel(x_hbm, w1_ref, sb1_ref, w2_ref, sb2_ref, out_ref, xs, sem):
        n = pl.program_id(0)
        r = pl.program_id(1)

        # local row s ↔ frame row r·R + s − 2 (xp is pre-padded (2, 6))
        dma = pltpu.make_async_copy(
            x_hbm.at[n, :, pl.ds(r * R, S), :], xs, sem)
        dma.start()
        dma.wait()
        x = xs[...]

        acc1 = _conv3x3(x, w1_ref[...], full1)
        s1 = sb1_ref[0][:, None]
        b1 = sb1_ref[1][:, None]
        h = jnp.maximum(acc1 * s1 + b1, 0.0)
        h = h.reshape(cmid, S, W)
        # conv2's padding is zeros on the true frame: kill h rows outside it
        # (this also kills conv1's row-wrap garbage at s=0 when r=0; interior
        # wrap rows s∈{0, S−1} are simply never read by the output slice)
        yrow = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) + r * R - 2
        h = jnp.where((yrow >= 0) & (yrow < H), h, 0.0).astype(jnp.bfloat16)

        acc2 = _conv3x3(h, w2_ref[...], full2)
        s2 = sb2_ref[0][:, None]
        b2 = sb2_ref[1][:, None]
        y = jnp.maximum(acc2 * s2 + b2, 0.0)
        y = y.reshape(cout, S, W)
        out_ref[0] = y[:, 2:2 + R, :].astype(out_dtype)

    return kernel


def _row_block(H: int, W: int, cin: int) -> int:
    """Largest power-of-two row block whose K-stack fits the VMEM budget."""
    R = min(H, 64)
    while R > 8 and 9 * cin * (R + 8) * W * 2 > _VMEM_STACK_BUDGET:
        R //= 2
    return R


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_double_cbr(x: jax.Array,
                     w1: jax.Array, scale1: jax.Array, bias1: jax.Array,
                     w2: jax.Array, scale2: jax.Array, bias2: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Two chained Conv3x3(no bias, zero pad 1) + folded-BN + ReLU.

    x:  (N, Cin, H, W) bf16/f32, W % 128 == 0, H % 8 == 0.
    w1: (Cmid, 9·Cin) bf16 — HWIO kernel transposed to (O, ky, kx, I) and
        flattened over (ky, kx, I); w2 likewise (Cout, 9·Cmid).
    scale/bias: per-channel f32 — BN folded as y = max(conv·scale + bias, 0).
    Returns (N, Cout, H, W) in x.dtype.
    """
    N, cin, H, W = x.shape
    cmid = w1.shape[0]
    cout = w2.shape[0]
    out_dtype = x.dtype

    R = _row_block(H, W, max(cin, cmid))
    num_r = H // R
    assert H % R == 0, (H, R)

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (2, 6), (0, 0)))
    full1 = 9 * cin * (R + 8) * W * 2 <= _VMEM_STACK_BUDGET
    full2 = 9 * cmid * (R + 8) * W * 2 <= _VMEM_STACK_BUDGET
    sb1 = jnp.stack([scale1, bias1]).astype(jnp.float32)
    sb2 = jnp.stack([scale2, bias2]).astype(jnp.float32)

    kernel = _make_kernel(N, cin, cmid, cout, H, W, R, full1, full2,
                          out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(N, num_r),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cmid, 9 * cin), lambda n, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cmid), lambda n, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cmid), lambda n, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cout), lambda n, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, R, W), lambda n, r: (n, 0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, cout, H, W), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((cin, R + 8, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        # the wide pairs (e.g. u3: 384→192 at 128²) hold ~22 MB of stack
        # values at once; the 16 MB default scoped-vmem limit is too tight
        # (v5e has 128 MB of VMEM)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(xp, w1.astype(jnp.bfloat16), sb1, w2.astype(jnp.bfloat16), sb2)


def pack_conv_weight(hwio: jax.Array) -> jax.Array:
    """(3, 3, Cin, Cout) HWIO flax kernel → (Cout, 9·Cin) with the K-order
    (ky, kx, ci) the kernel's tap stack uses."""
    kh, kw, cin, cout = hwio.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    return jnp.transpose(hwio, (3, 0, 1, 2)).reshape(cout, 9 * cin)


def fold_batchnorm(gamma, beta, mean, var, eps: float = 1e-5):
    """Inference BN → (scale, bias) applied on the conv accumulator."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale
