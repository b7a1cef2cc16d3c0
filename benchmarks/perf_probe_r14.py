"""Probe r14 — baseline sliding-window path: why 5.1 f/s? (VERDICT r2 #5)

FLOPs accounting (exact layer sum): one 448×576 patch forward through the
7-stage PlainConvUNet is 130.9 GFLOP; a frame is 4 tiles × 4 mirrors =
2 095 GFLOP.  At r2's measured 5.1 f/s that is 10.7 TF/s — **5 % MFU**,
nowhere near a compute ceiling (the flagship sustains 35 %).  This probe
splits the path on hardware:

1. bare patch forward at tile batch 8 / 16 / 32 (+ the 4×8=32 mirror batch)
   → is the net itself slow, or the harness around it?
2. sliding_window_predict end-to-end: (tile_batch, mirror_batch) variants
   → does batching the mirror views into one forward help?
3. softmax+accumulate cost by subtraction.

Shapes compile once each (~minutes through the remote service) — run all
variants in THIS one process (NOTES.md round-3: cross-process compile
caching is broken).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PATCH_GFLOP = 130.9
PEAK_TFS = 197.0        # v5e bf16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config
    from att_aspp_unet_tpu.models import PlainConvUNet
    from att_aspp_unet_tpu.models.sliding_window import sliding_window_predict

    wall0 = time.time()
    print(f"[r14] backend={jax.default_backend()}", file=sys.stderr)
    cfg = Config()
    pu = cfg.plain_unet
    model = PlainConvUNet.from_config(pu)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, pu.patch_size[0], pu.patch_size[1], 1), jnp.float32),
        train=False)
    apply_fn = lambda v, x: model.apply(v, x, train=False)
    th, tw = pu.patch_size
    rng = np.random.default_rng(0)

    def timeit(fn, *a):
        fn(*a)                                    # compile + warm
        warm_at = time.time() - wall0
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            fn(*a)
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2], warm_at

    # ---- 1. bare patch forward ----
    for B in (8, 16, 32):
        x = jnp.asarray(rng.random((B, th, tw, 1)).astype(np.float32))
        f = jax.jit(lambda x: apply_fn(variables, x))
        run = lambda x=x, f=f: float(jnp.sum(f(x).astype(jnp.float32)))
        med, warm_at = timeit(run)
        tfs = B * PATCH_GFLOP / med / 1e3
        print(f"[r14] bare fwd B={B}: {med*1e3:.1f} ms  {tfs:.1f} TF/s "
              f"({100*tfs/PEAK_TFS:.0f}% MFU)  [warm +{warm_at:.0f}s]")

    # ---- 2. sliding window variants ----
    frames = jnp.asarray(rng.random((args.frames, 562, 744))
                         .astype(np.float32))
    for tb, mb in ((8, False), (8, True), (16, True)):
        run = lambda tb=tb, mb=mb: float(jnp.sum(sliding_window_predict(
            apply_fn, variables, frames, tuple(pu.patch_size), pu.tile_step,
            True, True, tb, mb).astype(jnp.float32)))
        med, warm_at = timeit(run)
        fps = args.frames / med
        tfs = args.frames * 16 * PATCH_GFLOP / med / 1e3
        print(f"[r14] sliding tb={tb} mirror_batch={mb}: {med:.2f} s "
              f"({fps:.1f} f/s, {tfs:.1f} TF/s, {100*tfs/PEAK_TFS:.0f}% MFU) "
              f"[warm +{warm_at:.0f}s]")

    # ---- 3. no-mirroring variant (4x fewer forwards) ----
    run = lambda: float(jnp.sum(sliding_window_predict(
        apply_fn, variables, frames, tuple(pu.patch_size), pu.tile_step,
        True, False, 8, False).astype(jnp.float32)))
    med, warm_at = timeit(run)
    print(f"[r14] sliding no-mirror tb=8: {med:.2f} s "
          f"({args.frames / med:.1f} f/s) [warm +{warm_at:.0f}s]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
