"""Probe r22 — train-step A/B: direct vs w2d_stage lowering.

The packed 512-level now trains (nn/packed_stage.py); this measures the
reference training config (512², global batch 8, fused augmentation)
under both lowerings in one process.  Median of --iters steps after a
warmup step; fresh PRNG folding per step like the real loop.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, MeshConfig, ModelConfig,
                                          PreprocessConfig, TrainConfig)
    from att_aspp_unet_tpu.parallel.mesh import (batch_sharding,
                                                 make_mesh_for_batch,
                                                 replicate)
    from att_aspp_unet_tpu.train.train_loop import (create_train_state,
                                                    make_train_step)

    print(f"[r22] backend={jax.default_backend()}", file=sys.stderr)
    S, B = args.img_size, args.batch
    rng = np.random.default_rng(0)
    images = (rng.random((B, S, S)) * 255).astype(np.uint8)
    masks = (rng.random((B, S, S)) > 0.8).astype(np.uint8) * 255
    results = {}
    for lowering in ("direct", "w2d_stage"):
        cfg = Config(preprocess=PreprocessConfig(img_size=S),
                     model=ModelConfig(base_c=48, conv_lowering=lowering),
                     train=TrainConfig(batch_size=B))
        mesh = make_mesh_for_batch(MeshConfig(), B)
        rep, data_sh = replicate(mesh), batch_sharding(mesh, 3)
        state = create_train_state(cfg.model, cfg.train,
                                   steps_per_epoch=100,
                                   rng=jax.random.PRNGKey(0),
                                   sample_hw=(S, S))
        state = jax.device_put(state, rep)
        step = jax.jit(make_train_step(cfg),
                       in_shardings=(rep, data_sh, data_sh, rep),
                       out_shardings=(rep, rep),
                       donate_argnums=(0,))
        imgs = jax.device_put(images, data_sh)
        msks = jax.device_put(masks, data_sh)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        state, m = step(state, imgs, msks, key)
        print(f"[r22] {lowering}: compile+first {time.time()-t0:.1f}s "
              f"loss={float(m['loss']):.4f}", file=sys.stderr)
        ts = []
        for i in range(args.iters):
            k = jax.random.fold_in(key, i)
            t0 = time.time()
            state, m = step(state, imgs, msks, k)
            float(jnp.sum(m["loss"]))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"[r22] {lowering}: {med*1e3:.1f} ms/step "
              f"({B/med:.1f} samples/s)", file=sys.stderr)
        results[lowering] = med
    d, w = results["direct"], results["w2d_stage"]
    print(f"[r22] SUMMARY direct {B/d:.1f} vs w2d_stage {B/w:.1f} "
          f"samples/s  x{d/w:.2f} (>1 = packed wins)", file=sys.stderr)
    print(json.dumps({"probe": "r22", "direct_s": round(d, 4),
                      "w2d_stage_s": round(w, 4),
                      "ratio": round(d / w, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
