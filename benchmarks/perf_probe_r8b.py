#!/usr/bin/env python
"""Round-2 probe, part 11: augment_batch internal cost split (512², B=8).

probe r8: the full train step is 0.263 s of which augmentation is 0.140 s.
Times: full augment_batch, warp-only (affine+elastic gathers), elastic-field
generation only, CLAHE+median only, intensity-only.
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

    from att_aspp_unet_tpu.config import AugmentConfig
    from att_aspp_unet_tpu.ops import clahe, median3x3
    from att_aspp_unet_tpu.train import augment as au

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    B, S = 8, 512
    rng = np.random.default_rng(0)
    imgs = jax.device_put((rng.random((B, S, S)) * 255).astype(np.uint8))
    msks = jax.device_put((rng.random((B, S, S)) > 0.7).astype(np.uint8) * 255)
    jax.block_until_ready((imgs, msks))
    cfg = AugmentConfig()
    key = jax.random.PRNGKey(0)

    def timed(name, fn):
        t0 = time.time()
        fn()
        comp = time.time() - t0
        t = med(fn)
        print(f"{name:14s} compile={comp:6.1f}s run={t:7.4f}s", flush=True)

    full = jax.jit(lambda k, i, m: au.augment_batch(k, i, m, cfg, True))
    timed("full", lambda: float(jnp.sum(full(key, imgs, msks)[0])))

    @jax.jit
    def warps_only(k, i, m):
        def one(kk, img, msk):
            H, W = img.shape
            kp, ke = jax.random.split(kk)
            params = au._sample_params(kp, cfg)
            ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
            xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
            M = au._inverse_affine(params, H, W)
            sx = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
            sy = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
            a = au._warp(img.astype(jnp.float32), sy, sx, order=1)
            b = au._warp(msk.astype(jnp.float32), sy, sx, order=0)
            return a + b
        keys = jax.random.split(k, i.shape[0])
        return jnp.sum(jax.vmap(one)(keys, i, m))

    timed("warps_only", lambda: float(warps_only(key, imgs, msks)))

    @jax.jit
    def field_only(k):
        def one(kk):
            dx, dy = au._elastic_field(kk, S, S, cfg.elastic_alpha,
                                       cfg.elastic_sigma)
            return jnp.sum(dx) + jnp.sum(dy)
        return jnp.sum(jax.vmap(one)(jax.random.split(k, B)))

    timed("field_only", lambda: float(field_only(key)))

    enh = jax.jit(lambda i: jnp.sum(median3x3(clahe(i, 1.0, (8, 8)))
                                    .astype(jnp.int32)))
    timed("clahe_median", lambda: float(enh(imgs)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
