#!/usr/bin/env python
"""Round-2 performance probes on the real TPU.

Times the candidate optimizations from NOTES.md / VERDICT.md one program at
a time (each new shape compiles through the remote service — batch everything
in one process).  Prints one line per experiment:

    name  compile_s  median_run_s  frames_per_s

Usage: python benchmarks/perf_probe_r2.py [--only name1,name2]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.config import ModelConfig
    from att_aspp_unet_tpu.infer.engine import predict_sweep_probs
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    N, S = args.frames, 512
    rng = np.random.default_rng(0)
    x512 = jax.device_put(rng.random((N, S, S)).astype(np.float32))
    x512.block_until_ready()

    results = {}

    def report(name, compile_s, run_s, per_frame_count=N):
        fps = per_frame_count / run_s if run_s > 0 else float("inf")
        results[name] = (compile_s, run_s, fps)
        print(f"{name:24s} compile={compile_s:7.1f}s run={run_s:7.4f}s "
              f"fps={fps:8.1f}", flush=True)

    def fwd_exp(name, base_c, impl, hflip, batch=32):
        cfg = ModelConfig(base_c=base_c, aspp_impl=impl)
        model = AttentionASPPUNet.from_config(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, S, S, 1), jnp.float32),
                               train=False)
        apply_fn = lambda v, inp: model.apply(v, inp, train=False)
        run = lambda: float(jnp.sum(predict_sweep_probs(
            apply_fn, variables, x512, batch, hflip)))
        t0 = time.time()
        run()
        report(name, time.time() - t0, _med(run, args.iters))

    todo = [
        ("fwd_tta_conv", lambda: fwd_exp("fwd_tta_conv", 48, "conv", True)),
        ("fwd_nt_conv", lambda: fwd_exp("fwd_nt_conv", 48, "conv", False)),
        ("fwd_nt_mm", lambda: fwd_exp("fwd_nt_mm", 48, "matmul", False)),
        ("fwd_nt_mm_c64", lambda: fwd_exp("fwd_nt_mm_c64", 64, "matmul", False)),
    ]

    def pre_exp():
        from att_aspp_unet_tpu.ops.image import gaussian_blur, resize_bilinear
        from att_aspp_unet_tpu.preprocess.enhance import preprocess_sweep
        import functools

        H, W = 562, 744
        sweep = jax.device_put((rng.random((N, H, W)) * 255).astype(np.uint8))
        sweep.block_until_ready()

        @functools.partial(jax.jit, static_argnames=())
        def pre(sw):
            xs = preprocess_sweep(sw, S, 1.0, 8, 3)
            # stand-in for the net: pass probabilities straight through
            native = resize_bilinear(xs, (H, W))
            return gaussian_blur(native, 5, 0.0)

        run = lambda: float(jnp.sum(pre(sweep)))
        t0 = time.time()
        run()
        report("pre_resize_blur", time.time() - t0, _med(run, args.iters))

    todo.append(("pre_resize_blur", pre_exp))

    def refine_exp():
        from att_aspp_unet_tpu.postprocess import refine_mask

        H, W = 562, 744
        # realistic blobby masks: one big ellipse + a few specks per frame
        yy, xx = np.mgrid[:H, :W]
        masks = np.zeros((5, H, W), np.uint8)
        for i in range(5):
            cy, cx = 280 + 12 * i, 370 - 9 * i
            masks[i] = (((yy - cy) / (90 + 6 * i)) ** 2 +
                        ((xx - cx) / (130 - 7 * i)) ** 2 < 1).astype(np.uint8)
            masks[i, 40 + i * 7: 44 + i * 7, 60: 70] = 1     # speck
            masks[i, 420: 425, 600 + i: 640] = 1             # speck
            # punch a hole to exercise fill
            masks[i][((yy - cy) / 14) ** 2 + ((xx - cx) / 20) ** 2 < 1] = 0
        dm = jax.device_put(masks)
        dm.block_until_ready()

        run = lambda: float(jnp.sum(refine_mask(dm, 20, 0.0015, 7)))
        t0 = time.time()
        run()
        report("refine5_native", time.time() - t0, _med(run, args.iters),
               per_frame_count=5)

    todo.append(("refine5_native", refine_exp))

    for name, fn in todo:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:  # keep probing the rest
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
