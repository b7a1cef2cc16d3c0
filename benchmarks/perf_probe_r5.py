#!/usr/bin/env python
"""Round-2 probes, part 3: train-step MFU attribution (VERDICT item 10).

bench --train measured ~31 samples/s at 512² bs8 (MFU ≈ 12 %).  Splits the
fused augment→forward→backward→update step into timed pieces:

- aug: augment_batch alone (map_coordinates gather + elastic smooth + CLAHE)
- fwd: forward + loss only (no grad)
- fwdbwd: value_and_grad without optimizer update
- step: the full production train step (donated buffers)
- step_noaug: train step fed pre-augmented floats (isolates aug cost inside
  the fused program)

Prints: name  compile_s  median_run_s  samples_per_s
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _med(f, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from att_aspp_unet_tpu.config import Config
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.train.augment import augment_batch
    from att_aspp_unet_tpu.train.losses import combined_criterion

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    B, S = args.batch, 512
    rng = np.random.default_rng(0)
    imgs = jax.device_put((rng.random((B, S, S)) * 255).astype(np.uint8))
    msks = jax.device_put(
        (rng.random((B, S, S)) > 0.7).astype(np.uint8) * 255)
    key = jax.random.PRNGKey(0)

    cfg = Config()
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 1), jnp.float32), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(3e-4, weight_decay=5e-4)
    opt_state = tx.init(params)

    def report(name, compile_s, run_s):
        print(f"{name:16s} compile={compile_s:7.1f}s run={run_s:7.4f}s "
              f"samples/s={B / run_s:7.1f}", flush=True)

    def timed(name, run):
        t0 = time.time()
        run()
        report(name, time.time() - t0, _med(run, args.iters))

    # ---- aug alone ---------------------------------------------------------
    def aug_exp():
        f = lambda: float(jnp.sum(
            augment_batch(key, imgs, msks, cfg.augment, train=True)[0]))
        timed("aug", f)

    # ---- fwd / fwdbwd / full step ------------------------------------------
    def loss_fn(p, bs, x, y):
        out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                               train=True, mutable=["batch_stats"])
        loss = combined_criterion(out, y, jnp.ones((y.shape[0],)),
                                  cfg.train.loss)
        return loss, mut["batch_stats"]

    @jax.jit
    def fwd(p, bs, k):
        x, y = augment_batch(k, imgs, msks, cfg.augment, train=True)
        loss, _ = loss_fn(p, bs, x, y)
        return loss

    @jax.jit
    def fwdbwd(p, bs, k):
        x, y = augment_batch(k, imgs, msks, cfg.augment, train=True)
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x, y)
        return loss, jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)

    @jax.jit
    def step(p, bs, os_, k):
        x, y = augment_batch(k, imgs, msks, cfg.augment, train=True)
        (loss, new_bs), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, x, y)
        up, new_os = tx.update(g, os_, p)
        return optax.apply_updates(p, up), new_bs, new_os, loss

    x0, y0 = augment_batch(key, imgs, msks, cfg.augment, train=True)
    x0, y0 = jax.device_put(np.asarray(x0)), jax.device_put(np.asarray(y0))

    @jax.jit
    def step_noaug(p, bs, os_, x, y):
        (loss, new_bs), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, bs, x, y)
        up, new_os = tx.update(g, os_, p)
        return optax.apply_updates(p, up), new_bs, new_os, loss

    exps = [
        ("aug", aug_exp),
        ("fwd", lambda: timed(
            "fwd", lambda: float(fwd(params, batch_stats, key)))),
        ("fwdbwd", lambda: timed(
            "fwdbwd", lambda: float(fwdbwd(params, batch_stats, key)[0]))),
        ("step", lambda: timed(
            "step", lambda: float(step(params, batch_stats, opt_state,
                                       key)[3]))),
        ("step_noaug", lambda: timed(
            "step_noaug", lambda: float(step_noaug(
                params, batch_stats, opt_state, x0, y0)[3]))),
    ]

    for name, fn in exps:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
