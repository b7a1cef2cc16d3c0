#!/usr/bin/env python
"""Round-2 probe, part 6: train-step cost attribution (VERDICT item 10).

Round-1 measured ~31 samples/s at 512²/bs8 (~12 % MFU, fwd+bwd ≈ 3×236
GFLOP/sample).  This probe splits the jitted step into nested subsets, all
on one chip, batch 8 unless noted:

- full:       augment → fwd → bwd → adamw update (the bench --train path)
- noaug:      pre-augmented f32 inputs, fwd → bwd → update
- fwdbwd:     value_and_grad only, no optimizer update
- fwd:        forward (train=True, mutable batch_stats) only
- full_b16/32: the full step at larger batches (MFU headroom check)

Prints name / compile_s / median_s / samples_per_s.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--base-c", type=int, default=48)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.config import Config, ModelConfig, PreprocessConfig, \
        TrainConfig
    from att_aspp_unet_tpu.train.augment import augment_batch
    from att_aspp_unet_tpu.train.losses import build_criterion
    from att_aspp_unet_tpu.train.train_loop import (create_train_state,
                                                    make_train_step)

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr, flush=True)

    S = args.img_size
    rng = np.random.default_rng(0)

    def timed(name, run, batch):
        t0 = time.time()
        run()
        compile_s = time.time() - t0
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name:12s} compile={compile_s:6.1f}s run={med:7.4f}s "
              f"samples/s={batch / med:6.1f}", flush=True)

    def inputs(B):
        imgs = (rng.random((B, S, S)) * 255).astype(np.uint8)
        msks = np.zeros((B, S, S), np.uint8)
        msks[:, S // 4: 3 * S // 4, S // 4: 3 * S // 4] = 255
        return jax.device_put(imgs), jax.device_put(msks)

    def mk(B):
        cfg = Config(preprocess=PreprocessConfig(img_size=S),
                     model=ModelConfig(base_c=args.base_c),
                     train=TrainConfig(batch_size=B))
        state = create_train_state(cfg.model, cfg.train, steps_per_epoch=100,
                                   rng=jax.random.PRNGKey(0), sample_hw=(S, S))
        return cfg, jax.device_put(state)

    key = jax.random.PRNGKey(1)

    def full_exp(name, B):
        cfg, state = mk(B)
        imgs, msks = inputs(B)
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        st = [state]

        def run():
            st[0], m = step(st[0], imgs, msks, key)
            float(jax.device_get(m["loss"]))
        timed(name, run, B)

    def noaug_exp(name, B):
        cfg, state = mk(B)
        imgs, msks = inputs(B)
        x, y = jax.jit(lambda i, m: augment_batch(
            key, i, m, cfg.train.augment, train=False))(imgs, msks)
        criterion = build_criterion(cfg.train.loss, cfg.train.stage)

        def step_fn(state, x, y, rng):
            import dataclasses as dc

            def loss_fn(params):
                (logits, _), upd = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return criterion(logits, y), upd["batch_stats"]
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = state.tx.update(grads, state.opt_state,
                                               state.params)
            import optax
            new_params = optax.apply_updates(state.params, updates)
            return dc.replace(state, step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt), loss

        step = jax.jit(step_fn, donate_argnums=(0,))
        st = [state]

        def run():
            st[0], loss = step(st[0], x, y, key)
            float(jax.device_get(loss))
        timed(name, run, B)

    def fwdbwd_exp(name, B, bwd=True):
        cfg, state = mk(B)
        imgs, msks = inputs(B)
        x, y = jax.jit(lambda i, m: augment_batch(
            key, i, m, cfg.train.augment, train=False))(imgs, msks)
        criterion = build_criterion(cfg.train.loss, cfg.train.stage)

        def loss_of(params, stats, x, y, rng):
            (logits, _), upd = state.apply_fn(
                {"params": params, "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return criterion(logits, y), upd["batch_stats"]

        if bwd:
            def f(params, stats, x, y, rng):
                (loss, _), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(params, stats, x, y, rng)
                return loss, grads
        else:
            f = loss_of
        step = jax.jit(f)

        def run():
            out = step(state.params, state.batch_stats, x, y, key)
            float(jax.device_get(out[0]))
        timed(name, run, B)

    exps = [
        ("full", lambda: full_exp("full", 8)),
        ("noaug", lambda: noaug_exp("noaug", 8)),
        ("fwdbwd", lambda: fwdbwd_exp("fwdbwd", 8)),
        ("fwd", lambda: fwdbwd_exp("fwd", 8, bwd=False)),
        ("full_b16", lambda: full_exp("full_b16", 16)),
        ("full_b32", lambda: full_exp("full_b32", 32)),
    ]
    for name, fn in exps:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
