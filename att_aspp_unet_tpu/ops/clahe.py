"""CLAHE (contrast-limited adaptive histogram equalisation) on device.

Faithful to OpenCV's ``cv2.createCLAHE(clipLimit, tileGridSize)`` — the
per-frame enhancer the reference applied in a Python loop
(``/root/reference/inference.py:168-176``) — but batched over the whole sweep
as a single XLA program:

1. Pad bottom/right with REFLECT_101 so H, W divide the tile grid.
2. Per-tile 256-bin histogram.  Rather than 256-way one-hot scatter-adds
   (bandwidth-hostile), we sort each tile's pixels and read the CDF off with a
   vectorised ``searchsorted`` — sorting maps well onto the VPU and the
   histogram follows as a first difference.
3. Clip at ``max(clipLimit·tileArea/256, 1)``, redistribute the excess the way
   OpenCV does (uniform batch + stepped residual).
4. Per-tile LUT = round(CDF · 255/tileArea).
5. Each *unpadded* pixel bilinearly blends the LUTs of its 4 neighbouring
   tiles, sampled at the pixel's own value (one gather).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe(frames: jax.Array, clip_limit: float = 1.0,
          grid: Tuple[int, int] = (8, 8)) -> jax.Array:
    """Apply CLAHE to a stack of uint8 frames ``(..., H, W)`` → uint8."""
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
    tile_area = th * tw
    n_tiles = tiles_y * tiles_x

    # ---- per-tile histograms via sort + searchsorted -----------------------
    tiles = xe.reshape(N, tiles_y, th, tiles_x, tw)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(N * n_tiles, tile_area)
    tiles = tiles.astype(jnp.int32)
    sorted_vals = jnp.sort(tiles, axis=1)
    bins = jnp.arange(256, dtype=jnp.int32)
    # cdf[t, i] = #pixels <= i   (searchsorted 'right', vmapped over tiles)
    cdf_raw = jax.vmap(lambda s: jnp.searchsorted(s, bins, side="right"))(sorted_vals)
    hist = jnp.diff(cdf_raw, axis=1, prepend=0).astype(jnp.int32)

    # ---- clip + OpenCV-style redistribution --------------------------------
    clip = max(int(clip_limit * tile_area / 256), 1)
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)        # (T, 1)
    batch = excess // 256
    residual = excess % 256
    clipped = clipped + batch
    # residual: +1 at i = k*step for k < residual, step = max(256//residual, 1)
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    idx = bins[None, :]
    bonus = ((idx % step == 0) & (idx // step < residual)).astype(jnp.int32)
    clipped = clipped + jnp.where(residual > 0, bonus, 0)

    # ---- LUTs --------------------------------------------------------------
    lut_scale = 255.0 / tile_area
    luts = jnp.clip(jnp.rint(jnp.cumsum(clipped, axis=1) * lut_scale), 0, 255)
    luts = luts.astype(jnp.int32).reshape(N, n_tiles, 256)

    # ---- bilinear blend of 4 neighbouring tile LUTs ------------------------
    inv_th, inv_tw = 1.0 / th, 1.0 / tw
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    tyf = ys * inv_th - 0.5
    txf = xs * inv_tw - 0.5
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = (tyf - ty1)[:, None]                                       # (H, 1)
    xa = (txf - tx1)[None, :]                                       # (1, W)
    ty1c = jnp.clip(ty1, 0, tiles_y - 1)
    ty2c = jnp.clip(ty1 + 1, 0, tiles_y - 1)
    tx1c = jnp.clip(tx1, 0, tiles_x - 1)
    tx2c = jnp.clip(tx1 + 1, 0, tiles_x - 1)

    t11 = (ty1c[:, None] * tiles_x + tx1c[None, :])                 # (H, W)
    t12 = (ty1c[:, None] * tiles_x + tx2c[None, :])
    t21 = (ty2c[:, None] * tiles_x + tx1c[None, :])
    t22 = (ty2c[:, None] * tiles_x + tx2c[None, :])

    v = x.astype(jnp.int32)                                         # (N, H, W)

    def gather_lut(tmap):
        flat_idx = tmap[None, :, :] * 256 + v                        # (N, H, W)
        return jnp.take_along_axis(
            luts.reshape(N, n_tiles * 256), flat_idx.reshape(N, -1), axis=1
        ).reshape(N, H, W).astype(jnp.float32)

    w11 = (1.0 - ya) * (1.0 - xa)
    w12 = (1.0 - ya) * xa
    w21 = ya * (1.0 - xa)
    w22 = ya * xa
    out = (gather_lut(t11) * w11 + gather_lut(t12) * w12 +
           gather_lut(t21) * w21 + gather_lut(t22) * w22)
    out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out.reshape(lead + (H, W))
