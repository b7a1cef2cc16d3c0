#!/usr/bin/env python
"""Round-2 probe, part 10: three-way split of _predict_case_impl.

(1) _predict_full_impl alone (enhance→forward→resize→blur)
(2) postprocess-only jit given probs (threshold→top-K→gather→pad→refine)
(3) the combined _predict_case_impl
If (3) >> (1)+(2), the one-program combination itself costs (scheduling /
rematerialization); otherwise the split names the slow stage.
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tta", action="store_true")
    args = ap.parse_args()

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import functools

    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import (AttAsppEngine,
                                                _predict_case_impl,
                                                _predict_full_impl)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.postprocess.refine import (_refine_mask_padded,
                                                      refine_bucket_hw)

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    N, H, W = 140, 562, 744
    cfg = Config(predict=PredictConfig(frame_batch=args.batch, tta_hflip=args.tta))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 1), jnp.float32),
                           train=False)
    engine = AttAsppEngine(cfg, variables)
    rng = np.random.default_rng(0)
    sweep = jax.device_put((rng.random((N, H, W)) * 255).astype(np.uint8))
    sweep.block_until_ready()
    p, pc = cfg.preprocess, cfg.predict

    full = lambda: _predict_full_impl(
        engine._apply, engine.variables, sweep, p.img_size, p.clahe_clip,
        p.clahe_grid, p.median_kernel, pc.frame_batch, pc.tta_hflip,
        pc.gaussian_kernel)
    probs = full()
    probs.block_until_ready()
    thr = float(jnp.quantile(probs.astype(jnp.float32), 0.97))
    t_full = med(lambda: float(jnp.sum(full())))
    print(f"full(fwd)    run={t_full:.4f}s", flush=True)

    @functools.partial(jax.jit, static_argnames=("threshold", "n_cand"))
    def post_only(probs, n_valid, threshold, n_cand):
        binary = (probs > threshold).astype(jnp.uint8)
        n = binary.shape[0]
        areas = binary.sum(axis=(-2, -1), dtype=jnp.int32)
        k_pow = 1 << max(1, (n - 1).bit_length())
        idx = jnp.arange(n, dtype=jnp.int32)
        key = areas * jnp.int32(k_pow) + idx
        key = jnp.where(idx < n_valid, key, -1)
        order = jnp.argsort(-key)
        cand_idx = order[:n_cand]
        cand = binary[cand_idx]
        hb, wb = refine_bucket_hw(H, W)
        padded = jnp.pad(cand, ((0, 0), (0, hb - H), (0, wb - W)))
        refined = _refine_mask_padded(padded, jnp.asarray([H, W], jnp.int32),
                                      pc.min_area_px, pc.min_area_frac,
                                      pc.close_kernel)
        return cand_idx, refined[..., :H, :W]

    ci, rf = post_only(probs, jnp.int32(N), thr, 8)
    jax.block_until_ready((ci, rf))
    t_post = med(lambda: float(jnp.sum(
        post_only(probs, jnp.int32(N), thr, 8)[1].astype(jnp.int32))))
    print(f"post_only    run={t_post:.4f}s", flush=True)

    case = lambda: _predict_case_impl(
        engine._apply, engine.variables, sweep, N, p.img_size,
        p.clahe_clip, p.clahe_grid, p.median_kernel, pc.frame_batch,
        pc.tta_hflip, pc.gaussian_kernel, thr, 8, pc.min_area_px,
        pc.min_area_frac, pc.close_kernel, refine_bucket_hw(H, W))
    ci, rf = case()
    jax.block_until_ready((ci, rf))
    t_case = med(lambda: float(jnp.sum(case()[1].astype(jnp.int32))))
    print(f"case(comb)   run={t_case:.4f}s  vs split sum "
          f"{t_full + t_post:.4f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
