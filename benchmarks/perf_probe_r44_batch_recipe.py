"""Probe r44 — larger-batch training recipe A/B (VERDICT r4 #6).

The reference pins batch 8 (``…stage.py:544``); the round-2/3 autopsies
(r8/r11) measured train MFU ~12 % as "bs8 small-batch physics" and bs16/
bs32 only ×1.06/×0.94 on raw step rate.  What was never shown is the
thing a user cares about: for the SAME wall-clock budget, does a larger
batch with linearly-scaled LR reach the same validation Dice?  This
probe trains the flagship at 512² on the synthetic task under a fixed
wall-clock budget per recipe — bs8/lr3e-4 (reference recipe) vs
bs16/6e-4 vs bs32/1.2e-3 — and reports steps, samples/s, and held-out
hard Dice (eval-path enhancement, threshold 0.5).

Same process, same generated data, same init seed for every recipe.
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
    ap.add_argument("--budget-s", type=float, default=150.0,
                    help="wall-clock training budget per recipe (excl. "
                         "compile and eval)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--recipes", default="8:3e-4,16:6e-4,32:1.2e-3")
    ap.add_argument("--n-train", type=int, default=96)
    ap.add_argument("--n-val", type=int, default=24)
    ap.add_argument("--lowering", default="w2d_stage",
                    help="training lowering (w2d_stage is the shipped "
                         "training default, probe r22)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig,
                                          PreprocessConfig, TrainConfig)
    from att_aspp_unet_tpu.tools.synthetic import make_dataset
    from att_aspp_unet_tpu.train.augment import augment_batch
    from att_aspp_unet_tpu.train.train_loop import (create_train_state,
                                                    make_train_step)

    S = args.size
    print(f"[r44] backend={jax.default_backend()}; generating data "
          f"({args.n_train}+{args.n_val} @ {S}²)…", file=sys.stderr)
    t0 = time.time()
    tr_x, tr_y = make_dataset(args.n_train * 3 // 4,
                              args.n_train - args.n_train * 3 // 4, S,
                              seed=0)
    va_x, va_y = make_dataset(args.n_val * 3 // 4,
                              args.n_val - args.n_val * 3 // 4, S, seed=1)
    print(f"[r44] data generated in {time.time()-t0:.0f}s", file=sys.stderr)

    def val_dice(cfg, state):
        """Hard Dice on the held-out set through the eval path."""
        model_vars = {"params": state.params,
                      "batch_stats": state.batch_stats}
        inter = union = 0.0
        key = jax.random.PRNGKey(0)
        bs = 8
        for i in range(0, len(va_x), bs):
            xb, yb = va_x[i:i + bs], va_y[i:i + bs]
            x, y = augment_batch(key, xb, yb, cfg.train.augment,
                                 train=False)
            logits, _ = state.apply_fn(model_vars, x, train=False)
            pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
            yf = (y > 0.5).astype(jnp.float32)
            inter += float(jnp.sum(pred * yf))
            union += float(jnp.sum(pred) + jnp.sum(yf))
        return 2.0 * inter / max(union, 1.0)

    results = {}
    for spec in args.recipes.split(","):
        bs_s, lr_s = spec.split(":")
        B, lr = int(bs_s), float(lr_s)
        tag = f"bs{B}"
        cfg = Config(preprocess=PreprocessConfig(img_size=S),
                     model=ModelConfig(base_c=48,
                                       conv_lowering=args.lowering),
                     train=TrainConfig(batch_size=B, lr=lr, epochs=120))
        steps_per_epoch = max(1, len(tr_x) // B)
        state = create_train_state(cfg.model, cfg.train,
                                   steps_per_epoch=steps_per_epoch,
                                   rng=jax.random.PRNGKey(0),
                                   sample_hw=(S, S))
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        key = jax.random.PRNGKey(1)
        order = np.random.default_rng(2).permutation(len(tr_x))

        def batch(i):
            idx = order[(np.arange(B) + i * B) % len(tr_x)]
            return tr_x[idx], tr_y[idx]

        xb, yb = batch(0)
        t0 = time.time()
        state, m = step(state, xb, yb, key)
        float(jnp.sum(m["loss"]))
        print(f"[r44] {tag}/lr{lr:g}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        n = samples = 0
        t_start = time.time()
        while time.time() - t_start < args.budget_s:
            n += 1
            xb, yb = batch(n)
            state, m = step(state, xb, yb, jax.random.fold_in(key, n))
            samples += B
        float(jnp.sum(m["loss"]))
        wall = time.time() - t_start
        dice = val_dice(cfg, state)
        print(f"[r44] {tag}: {n} steps / {samples} samples in {wall:.0f}s "
              f"({samples/wall:.1f} samples/s), final loss "
              f"{float(m['loss']):.4f}, val hard-Dice {dice:.4f}",
              file=sys.stderr)
        results[tag] = dict(lr=lr, steps=n, samples=samples,
                            samples_per_s=samples / wall,
                            final_loss=float(m["loss"]),
                            val_dice=dice)

    print(f"[r44] SUMMARY "
          + "  ".join(f"{t}: dice {r['val_dice']:.3f} @ "
                      f"{r['samples_per_s']:.0f} samp/s"
                      for t, r in results.items()), file=sys.stderr)
    print(json.dumps({"probe": "r44", "budget_s": args.budget_s,
                      "lowering": args.lowering,
                      "results": {t: {k: (round(v, 5)
                                          if isinstance(v, float) else v)
                                      for k, v in r.items()}
                                  for t, r in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
