#!/usr/bin/env python
"""Round-2 probe B: refine compile-time attribution + forward batch sweep.

Prints one line per experiment: name, compile_s, median_run_s.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _med(f, iters=3):
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

    rng = np.random.default_rng(0)

    def report(name, compile_s, run_s):
        print(f"{name:24s} compile={compile_s:7.1f}s run={run_s:7.4f}s",
              flush=True)

    # ---------------- refine sub-stage compile attribution -------------
    H, W = 562, 744
    yy, xx = np.mgrid[:H, :W]
    masks = np.zeros((5, H, W), np.uint8)
    for i in range(5):
        cy, cx = 280 + 12 * i, 370 - 9 * i
        masks[i] = (((yy - cy) / (90 + 6 * i)) ** 2 +
                    ((xx - cx) / (130 - 7 * i)) ** 2 < 1).astype(np.uint8)
        masks[i][((yy - cy) / 14) ** 2 + ((xx - cx) / 20) ** 2 < 1] = 0
    dm = jax.device_put(masks)
    dm.block_until_ready()

    def stage(name, fn):
        run = lambda: float(jnp.sum(fn(dm)))
        t0 = time.time()
        run()
        report(name, time.time() - t0, _med(run))

    from att_aspp_unet_tpu.postprocess.cc import largest_component
    from att_aspp_unet_tpu.postprocess.morphology import (binary_closing,
                                                          fill_holes,
                                                          structuring_ellipse)

    se = structuring_ellipse(7)
    try:
        stage("cc_largest", lambda m: largest_component(m, 8, 2, 20))
    except Exception as e:
        print(f"cc_largest FAILED: {e}", flush=True)
    try:
        import functools
        closing_jit = jax.jit(lambda m: binary_closing(m, se))
        stage("closing7", closing_jit)
    except Exception as e:
        print(f"closing7 FAILED: {e}", flush=True)
    try:
        stage("fill_holes", fill_holes)
    except Exception as e:
        print(f"fill_holes FAILED: {e}", flush=True)

    # ---------------- forward batch sweep -------------
    from att_aspp_unet_tpu.config import ModelConfig
    from att_aspp_unet_tpu.infer.engine import predict_sweep_probs
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    N, S = 140, 512
    x512 = jax.device_put(rng.random((N, S, S)).astype(np.float32))
    x512.block_until_ready()
    cfg = ModelConfig(base_c=48)
    model = AttentionASPPUNet.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 1), jnp.float32), train=False)
    apply_fn = lambda v, inp: model.apply(v, inp, train=False)
    for b in (64, 16):
        try:
            run = lambda: float(jnp.sum(predict_sweep_probs(
                apply_fn, variables, x512, b, False)))
            t0 = time.time()
            run()
            c = time.time() - t0
            r = _med(run)
            print(f"fwd_nt_b{b:<18d} compile={c:7.1f}s run={r:7.4f}s "
                  f"fps={N / r:8.1f}", flush=True)
        except Exception as e:
            print(f"fwd_nt_b{b} FAILED: {e}", flush=True)

    # ---------------- preprocess + resize + blur -------------
    try:
        import functools

        from att_aspp_unet_tpu.ops.image import gaussian_blur, resize_bilinear
        from att_aspp_unet_tpu.preprocess.enhance import preprocess_sweep

        sweep = jax.device_put((rng.random((N, H, W)) * 255).astype(np.uint8))
        sweep.block_until_ready()

        @jax.jit
        def pre(sw):
            xs = preprocess_sweep(sw, 512, 1.0, (8, 8), 3)
            native = resize_bilinear(xs, (H, W))
            return gaussian_blur(native, 5, 0.0)

        run = lambda: float(jnp.sum(pre(sweep)))
        t0 = time.time()
        run()
        c = time.time() - t0
        r = _med(run)
        print(f"pre_resize_blur          compile={c:7.1f}s run={r:7.4f}s "
              f"fps={N / r:8.1f}", flush=True)
    except Exception as e:
        print(f"pre_resize_blur FAILED: {e}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
