#!/usr/bin/env python
"""Round-2 probe, part 12: warp lowering shootout at (B=8, 512²) on TPU.

- map_coords: jax.scipy.ndimage.map_coordinates ×2 (order 1 + order 0) — the
  current augment path (0.16 s, probe r8b).
- flat_take:  manual bilinear — 4 corner gathers of (img, mask) pairs from
  one flattened (B·H·W, 2) operand via jnp.take; mask nearest = corner
  select by (fy<.5, fx<.5).  Exact same output as map_coords.
- onehot_mm:  row-band one-hot matmul variant is future work (needs banding).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(f, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    B, H, W = 8, 512, 512
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((B, H, W)).astype(np.float32))
    msk = jax.device_put((rng.random((B, H, W)) > 0.7).astype(np.float32))
    # smooth-ish warp fields like affine+elastic
    ys = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (H, W))
    xs = np.broadcast_to(np.arange(W, dtype=np.float32)[None, :], (H, W))
    sy = jax.device_put(np.broadcast_to(
        (0.99 * ys + 0.05 * xs + 3.7).astype(np.float32), (B, H, W)).copy())
    sx = jax.device_put(np.broadcast_to(
        (1.01 * xs - 0.05 * ys - 2.2).astype(np.float32), (B, H, W)).copy())
    jax.block_until_ready((img, msk, sy, sx))

    def timed(name, fn):
        t0 = time.time()
        r0 = fn()
        comp = time.time() - t0
        t = med(fn)
        print(f"{name:12s} compile={comp:6.1f}s run={t:7.4f}s chk={r0:.2f}",
              flush=True)

    @jax.jit
    def map_coords(img, msk, sy, sx):
        def one(i, m, yy, xx):
            a = jax.scipy.ndimage.map_coordinates(i, [yy, xx], order=1,
                                                  mode="constant", cval=0.0)
            b = jax.scipy.ndimage.map_coordinates(m, [yy, xx], order=0,
                                                  mode="constant", cval=0.0)
            return a, b
        a, b = jax.vmap(one)(img, msk, sy, sx)
        return jnp.sum(a) + jnp.sum(b)

    timed("map_coords", lambda: float(map_coords(img, msk, sy, sx)))

    @jax.jit
    def flat_take(img, msk, sy, sx):
        pair = jnp.stack([img, msk], axis=-1).reshape(B * H * W, 2)
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = sy - y0
        fx = sx - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        b = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 0)

        def corner(dy, dx):
            yi = y0i + dy
            xi = x0i + dx
            valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            flat = (b * H + yc) * W + xc
            v = jnp.take(pair, flat, axis=0)            # (B,H,W,2)
            return v * valid[..., None].astype(v.dtype)

        c00 = corner(0, 0)
        c01 = corner(0, 1)
        c10 = corner(1, 0)
        c11 = corner(1, 1)
        wy = fy[..., None]
        wx = fx[..., None]
        bil = (c00 * (1 - wy) * (1 - wx) + c01 * (1 - wy) * wx +
               c10 * wy * (1 - wx) + c11 * wy * wx)
        a = bil[..., 0]
        near = jnp.where(fy[..., None] < 0.5,
                         jnp.where(wx < 0.5, c00, c01),
                         jnp.where(wx < 0.5, c10, c11))[..., 1]
        return jnp.sum(a) + jnp.sum(near)

    timed("flat_take", lambda: float(flat_take(img, msk, sy, sx)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
