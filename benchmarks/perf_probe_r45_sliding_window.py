"""Probe r45 — baseline sliding-window: one more look (VERDICT r4 #8).

Probe r14 stopped at tile_batch 16 (30.0 f/s, 32 % MFU with mirror TTA;
75.9 f/s without).  This probe sweeps tile_batch {16, 24, 32} with
mirror_batch, plus a bf16-accumulation variant question answered by
construction (accumulation is f32 scatter-add — not a knob worth a
numerics risk), to either move the figure or close the item with a
measured ceiling: per r14 the whole program is ONE dispatch, so TF/s
here is honest device throughput.

Trained-or-random weights don't matter for timing (content-independent
convs); random init is used.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# one 448×576 patch through the 7-stage PlainConvUNet (probe r14 FLOPs
# accounting): 130.9 GFLOP; a 562×744 frame = 4 tiles × 4 mirror views
GFLOP_PER_PATCH = 130.9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--tile-batches", default="16,24,32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config
    from att_aspp_unet_tpu.models import PlainConvUNet
    from att_aspp_unet_tpu.models.sliding_window import (
        compute_tile_starts, sliding_window_predict)

    print(f"[r45] backend={jax.default_backend()}", file=sys.stderr)
    pcfg = Config().plain_unet
    model = PlainConvUNet.from_config(pcfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, pcfg.patch_size[0], pcfg.patch_size[1], 1),
                  jnp.float32), train=False)
    apply_fn = lambda v, x: model.apply(v, x, train=False)  # noqa: E731

    H, W = 562, 744
    frames = jax.device_put(np.random.default_rng(0).random(
        (args.frames, H, W)).astype(np.float32))
    frames.block_until_ready()
    n_tiles = (len(compute_tile_starts(H, pcfg.patch_size[0], 0.5))
               * len(compute_tile_starts(W, pcfg.patch_size[1], 0.5)))
    gflop_frame = GFLOP_PER_PATCH * n_tiles * 4      # 4 mirror views

    results = {}
    for tb in (int(t) for t in args.tile_batches.split(",")):
        for mirroring in ((True,) if tb != 16 else (True, False)):
            tag = f"tb{tb}" + ("" if mirroring else "_nomirror")
            t0 = time.time()
            out = sliding_window_predict(
                apply_fn, variables, frames,
                tile_hw=tuple(pcfg.patch_size), use_mirroring=mirroring,
                tile_batch=tb, mirror_batch=True)
            float(jnp.sum(out))
            print(f"[r45] {tag}: compile+first {time.time()-t0:.1f}s",
                  file=sys.stderr)
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                float(jnp.sum(sliding_window_predict(
                    apply_fn, variables, frames,
                    tile_hw=tuple(pcfg.patch_size), use_mirroring=mirroring,
                    tile_batch=tb, mirror_batch=True)))
                ts.append(time.time() - t0)
            med = sorted(ts)[len(ts) // 2]
            fps = args.frames / med
            g = gflop_frame if mirroring else gflop_frame / 4
            tf = fps * g / 1e3
            print(f"[r45] {tag}: {med:.2f} s/sweep({args.frames}) "
                  f"{fps:.1f} f/s, {tf:.1f} TF/s "
                  f"({tf/197*100:.0f} % MFU)", file=sys.stderr)
            results[tag] = dict(s=med, fps=fps, tfs=tf)

    print(json.dumps({"probe": "r45", "results": {
        t: {k: round(v, 3) for k, v in r.items()}
        for t, r in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
