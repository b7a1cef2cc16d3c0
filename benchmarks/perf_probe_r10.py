#!/usr/bin/env python
"""Round-2 probe, part 8: where do the 0.38 s of predict_case postprocess go?

bench e2e measured 1.00 s/sweep vs 0.62 s for the same path without
postprocess.  Splits the remainder: device dispatch #2 (threshold→top-K→
refine), device→host transfer of the candidate masks, host exact-select,
host ellipse AC.
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

    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import (AttAsppEngine,
                                                _predict_case_impl)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.postprocess.refine import refine_bucket_hw
    from att_aspp_unet_tpu.postprocess.select import select_best_frame_exact
    from att_aspp_unet_tpu.measure.ellipse import measure_ac_mm

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    N, H, W = 140, 562, 744
    cfg = Config(preprocess=PreprocessConfig(),
                 model=ModelConfig(base_c=48),
                 predict=PredictConfig())
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 1), jnp.float32),
                           train=False)
    engine = AttAsppEngine(cfg, variables)
    rng = np.random.default_rng(0)
    sweep = jax.device_put((rng.random((N, H, W)) * 255).astype(np.uint8))
    sweep.block_until_ready()

    warm = engine.predict_full(sweep)
    thr = float(jnp.quantile(warm.astype(jnp.float32), 0.97))
    p, pc = cfg.preprocess, cfg.predict
    m = max(1, min(pc.topk_frames + pc.refine_margin, N))

    staged, pad = engine._stage_frames(sweep)

    def dispatch():
        ci, rf = _predict_case_impl(
            engine._apply, engine.variables, staged, jnp.int32(N), p.img_size,
            p.clahe_clip, p.clahe_grid, p.median_kernel, pc.frame_batch,
            pc.tta_hflip, pc.gaussian_kernel, thr, m, pc.min_area_px,
            pc.min_area_frac, pc.close_kernel, refine_bucket_hw(H, W))
        return ci, rf

    # warm/compile
    ci, rf = dispatch()
    ci.block_until_ready(); rf.block_until_ready()
    print(f"refined: shape={rf.shape} dtype={rf.dtype} "
          f"bytes={rf.size * rf.dtype.itemsize}", flush=True)

    t_disp = med(lambda: jax.block_until_ready(dispatch()))
    # force scalar readback too (tunnel early-return quirk)
    t_disp2 = med(lambda: float(jnp.sum(dispatch()[1].astype(jnp.float32))))

    ci, rf = dispatch()
    jax.block_until_ready((ci, rf))
    t_xfer = med(lambda: (np.asarray(ci), np.asarray(rf)))

    ci_h, rf_h = np.asarray(ci), np.asarray(rf)
    t_sel = med(lambda: select_best_frame_exact(rf_h, pc.topk_frames))
    local = select_best_frame_exact(rf_h, pc.topk_frames)
    t_ac = med(lambda: measure_ac_mm(rf_h[local], (0.28, 0.28)))

    print(f"dispatch(block)={t_disp:.4f}s dispatch(sum)={t_disp2:.4f}s "
          f"transfer={t_xfer:.4f}s select={t_sel:.4f}s ac={t_ac:.4f}s",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
