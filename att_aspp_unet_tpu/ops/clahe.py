"""CLAHE (contrast-limited adaptive histogram equalisation) on device.

Faithful to OpenCV's ``cv2.createCLAHE(clipLimit, tileGridSize)`` — the
per-frame enhancer the reference applied in a Python loop
(``/root/reference/inference.py:168-176``) — but batched over the whole sweep
as a single XLA program, with both stages shaped for the TPU:

1. Pad bottom/right with REFLECT_101 so H, W divide the tile grid.
2. **Histograms** per tile by compare-and-reduce against the 256 bin ids —
   a fused VPU reduction (scatter-adds and large sorts are
   bandwidth-hostile on a vector machine).
3. Clip at ``max(clipLimit·tileArea/256, 1)``, redistribute the excess the
   way OpenCV does (uniform batch + stepped residual); per-tile LUT =
   rint(CDF · 255/tileArea).
4. **Interpolation** on the dual grid: pixels regroup into
   (tiles+1)×(tiles+1) half-tile-shifted blocks, inside which the four
   neighbouring tile LUTs are *fixed* and the bilinear weights are a fixed
   per-position pattern.  Each block's lookup then becomes a one-hot matmul
   ``onehot(v) @ [L11 L12 L21 L22]`` — an MXU contraction instead of a
   scalarising per-pixel gather (the gather formulation measured ~25× slower
   on v5e).

Per-pixel results are bit-identical to the direct formulation: one-hot
matmul against integer-valued LUTs (≤255, exactly representable in bf16) is
an exact table lookup.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _compute_luts(xe: jax.Array, tiles_y: int, tiles_x: int,
                  clip_limit: float) -> jax.Array:
    """(N, He, We) uint8 → per-tile LUTs (N, tiles_y, tiles_x, 256) f32."""
    N, He, We = xe.shape
    th, tw = He // tiles_y, We // tiles_x
    tile_area = th * tw
    n_tiles = tiles_y * tiles_x

    tiles = xe.reshape(N, tiles_y, th, tiles_x, tw)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(N * n_tiles, tile_area)

    bins = jnp.arange(256, dtype=jnp.uint8)
    # fused compare→reduce histogram (no scatter, no sort)
    hist = jnp.sum(tiles[:, :, None] == bins[None, None, :], axis=1,
                   dtype=jnp.int32)                                # (T, 256)

    clip = max(int(clip_limit * tile_area / 256), 1)
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)
    batch = excess // 256
    residual = excess % 256
    clipped = clipped + batch
    # residual: +1 at i = k*step for k < residual, step = max(256//residual, 1)
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    idx = jnp.arange(256, dtype=jnp.int32)[None, :]
    bonus = ((idx % step == 0) & (idx // step < residual)).astype(jnp.int32)
    clipped = clipped + jnp.where(residual > 0, bonus, 0)

    lut_scale = 255.0 / tile_area
    luts = jnp.clip(jnp.rint(jnp.cumsum(clipped, axis=1) * lut_scale), 0, 255)
    return luts.astype(jnp.float32).reshape(N, tiles_y, tiles_x, 256)


def _fractional_weights(t: int) -> np.ndarray:
    """Within-block fractional weights: position r in a dual-grid block of
    size t has ya = (r − t//2)/t + 0.5 (cv2's ``y·(1/t) − 0.5`` pattern,
    periodic in t)."""
    r = np.arange(t, dtype=np.float64)
    ya = (r - (t // 2)).astype(np.float32) * np.float32(1.0 / t) + np.float32(0.5)
    return ya.astype(np.float32)


# Default interpolation lowering (resolved at trace time when ``impl`` is
# None).  The one-hot impls are bit-identical; ``nibble`` can differ ±1
# grey level on ~0.2 % of pixels — see ``_interp_blocks``.
_DEFAULT_IMPL = "onehot_bf16"


def _interp_blocks(blocks: jax.Array, corner_luts: jax.Array,
                   wts: jax.Array, impl: str) -> jax.Array:
    """Per-block LUT lookup + bilinear corner blend: (N, B, P) u8 values ×
    (N, B, 256, 4) f32 corner LUTs × (P, 4) weights → (N, B, P) f32.

    Every impl computes the exact integer table values ``L_c[v]``; the
    one-hot impls then run the identical f32 weighted blend and are
    bit-identical to each other (``nibble`` exposes its two stacked
    reductions to XLA reassociation — ±1 ULP in the blend, ≤±1 grey level
    after rounding on ~0.2 % of pixels).  They differ in how the lookup
    feeds the MXU (the gather formulation measured ~25× slower on v5e, so
    all impls are contractions):

    - ``onehot_bf16``: one-hot(v) ∈ bf16, (P,256)·(256,4) matmul per block.
      The materialised one-hot is ~274 MB/frame of HBM traffic — this path
      is HBM-bound at sweep scale.
    - ``onehot_int8``: same contraction with an int8 one-hot against
      ``L−128`` (int8 range), int32 accumulation, +128 after — halves the
      one-hot's HBM bytes.  Exact: the matmul selects single table entries.
    - ``nibble``: v splits into 4-bit halves; a 16-wide one-hot of the low
      nibble contracts against the (16, 16·4) reshaped LUT (MXU), then the
      high nibble selects among the 16 candidates on the VPU (fused reduce).
      One-hot traffic drops 16×; the (P, 64) bf16 intermediate holds exact
      integer table values (≤255 fits bf16's 8-bit mantissa).
    """
    bins = jnp.arange(256, dtype=jnp.uint8)

    if impl == "onehot_bf16":
        def frame_interp(args):
            vb, cl = args                                       # (B,P),(B,256,4)
            onehot = (vb[:, :, None] == bins[None, None, :]).astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                onehot, cl.astype(jnp.bfloat16),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)             # (B, P, 4)
            return jnp.sum(g * wts[None], axis=-1)              # (B, P)
    elif impl == "onehot_int8":
        def frame_interp(args):
            vb, cl = args
            onehot = (vb[:, :, None] == bins[None, None, :]).astype(jnp.int8)
            l8 = (cl - 128.0).astype(jnp.int8)                  # exact: cl ∈ [0,255] ints
            g = jax.lax.dot_general(
                onehot, l8, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)               # (B, P, 4)
            g = g.astype(jnp.float32) + 128.0                   # == L_c[v] exactly
            return jnp.sum(g * wts[None], axis=-1)
    elif impl == "nibble":
        nib = jnp.arange(16, dtype=jnp.uint8)

        def frame_interp(args):
            vb, cl = args
            B = vb.shape[0]
            lo = vb & jnp.uint8(15)
            hi = vb >> 4
            oh_lo = (lo[:, :, None] == nib[None, None, :]).astype(jnp.bfloat16)
            lr = cl.astype(jnp.bfloat16).reshape(B, 16, 16, 4)  # (hi, lo, c)
            lr = lr.transpose(0, 2, 1, 3).reshape(B, 16, 64)    # (lo, hi·c)
            t = jax.lax.dot_general(
                oh_lo, lr, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.bfloat16)            # (B, P, 64)
            t = t.reshape(B, -1, 16, 4).astype(jnp.float32)     # exact L entries
            oh_hi = (hi[:, :, None] == nib[None, None, :]).astype(jnp.float32)
            g = jnp.sum(t * oh_hi[..., None], axis=2)           # (B, P, 4)
            return jnp.sum(g * wts[None], axis=-1)
    else:
        raise ValueError(f"unknown CLAHE interp impl {impl!r}")

    return jax.lax.map(frame_interp, (blocks, corner_luts))


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid",
                                             "use_pallas", "impl"))
def clahe(frames: jax.Array, clip_limit: float = 1.0,
          grid: Tuple[int, int] = (8, 8),
          use_pallas: bool = None, impl: str = None) -> jax.Array:
    """Apply CLAHE to a stack of uint8 frames ``(..., H, W)`` → uint8.

    ``impl`` selects the interpolation lowering (see ``_interp_blocks``);
    ``None`` resolves to the module default at trace time.  The one-hot
    impls are bit-identical to each other and to the direct formulation;
    ``nibble`` exposes the blend to XLA reassociation (±1 grey level on
    ~0.2 % of pixels — the cv2-parity oracle is pinned on the default).

    ``use_pallas``: run step 5 as the VMEM-resident Pallas kernel
    (``ops/pallas/clahe_interp.py``) instead of the batched one-hot matmul.
    Default off: on v5e the XLA formulation measured ~2× faster (the per-frame
    block loop in the kernel serialises 81 small matmuls, while XLA pipelines
    the batched contraction), so Pallas stays an opt-in alternative.
    """
    tiles_y, tiles_x = int(grid[1]), int(grid[0])  # cv2 grid is (cols, rows)

    lead = frames.shape[:-2]
    H, W = frames.shape[-2], frames.shape[-1]
    x = frames.reshape((-1, H, W))
    N = x.shape[0]

    pad_h = (-H) % tiles_y
    pad_w = (-W) % tiles_x
    xe = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)), mode="reflect") \
        if (pad_h or pad_w) else x
    He, We = H + pad_h, W + pad_w
    th, tw = He // tiles_y, We // tiles_x

    luts = _compute_luts(xe, tiles_y, tiles_x, clip_limit)

    # ---- dual-grid block decomposition -----------------------------------
    # Row y uses tile rows ty1 = floor(y/th − .5) and ty1+1; boundaries fall
    # at y = th − th//2 + k·th, so padding the top by th//2 (and the bottom to
    # fill) regroups rows into (tiles_y + 1) uniform blocks with constant
    # (ty1, ty2) per block and a fixed fractional-weight pattern.
    pt, pl = th // 2, tw // 2
    pb = (tiles_y + 1) * th - H - pt
    pr = (tiles_x + 1) * tw - W - pl
    By, Bx = tiles_y + 1, tiles_x + 1
    vp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr)))
    blocks = vp.reshape(N, By, th, Bx, tw).transpose(0, 1, 3, 2, 4)
    blocks = blocks.reshape(N, By * Bx, th * tw)                   # (N, B, P)

    # corner LUTs per block: block k uses tile rows clamp(k−1), clamp(k)
    lpad_y = jnp.concatenate([luts[:, :1], luts, luts[:, -1:]], axis=1)
    lpad = jnp.concatenate([lpad_y[:, :, :1], lpad_y, lpad_y[:, :, -1:]],
                           axis=2)                                  # (N, ty+2, tx+2, 256)
    l11 = lpad[:, 0:By, 0:Bx]
    l12 = lpad[:, 0:By, 1:Bx + 1]
    l21 = lpad[:, 1:By + 1, 0:Bx]
    l22 = lpad[:, 1:By + 1, 1:Bx + 1]
    corner_luts = jnp.stack([l11, l12, l21, l22], axis=-1)          # (N,By,Bx,256,4)
    corner_luts = corner_luts.reshape(N, By * Bx, 256, 4)

    ya = jnp.asarray(_fractional_weights(th))                       # (th,)
    xa = jnp.asarray(_fractional_weights(tw))                       # (tw,)
    w11 = ((1 - ya)[:, None] * (1 - xa)[None, :]).reshape(-1)
    w12 = ((1 - ya)[:, None] * xa[None, :]).reshape(-1)
    w21 = (ya[:, None] * (1 - xa)[None, :]).reshape(-1)
    w22 = (ya[:, None] * xa[None, :]).reshape(-1)
    wts = jnp.stack([w11, w12, w21, w22], axis=-1)                  # (P, 4)

    if use_pallas is None:
        use_pallas = False

    if use_pallas:
        from .pallas.clahe_interp import clahe_interp_pallas_batched
        out_blocks = clahe_interp_pallas_batched(blocks.astype(jnp.int32),
                                                 corner_luts, wts)
    else:
        out_blocks = _interp_blocks(blocks, corner_luts, wts,
                                    impl or _DEFAULT_IMPL)
    out = out_blocks.reshape(N, By, Bx, th, tw).transpose(0, 1, 3, 2, 4)
    out = out.reshape(N, By * th, Bx * tw)[:, pt:pt + H, pl:pl + W]
    out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out.reshape(lead + (H, W))
