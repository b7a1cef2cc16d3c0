#!/usr/bin/env python
"""Round-2 probe, part 13: train-mode forward overhead split (bs8, 512²).

Inference forward costs ~0.027 s for 8 frames (b16 sweep rate), but the
train-mode forward inside the step costs 0.059 s (probe r8).  Splits:

- infer:        apply(train=False)
- train:        apply(train=True, mutable=batch_stats, dropout rng)
- train_nodrop: same but deterministic (no dropout rng → no threefry bits)
- train_rbg:    dropout on, but with the faster 'rbg' PRNG implementation

If nodrop ≈ infer, the gap is dropout PRNG (fixable via rbg); if not, it
is BatchNorm batch-statistics cost (training parity, keep).
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

    from att_aspp_unet_tpu.config import ModelConfig
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    B, S = 8, 512
    model = AttentionASPPUNet.from_config(ModelConfig(base_c=48))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((B, S, S, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    x.block_until_ready()
    key = jax.random.PRNGKey(1)

    def timed(name, fn):
        t0 = time.time()
        fn()
        comp = time.time() - t0
        t = med(fn)
        print(f"{name:14s} compile={comp:6.1f}s run={t:7.4f}s "
              f"samples/s={B / t:6.1f}", flush=True)

    @jax.jit
    def infer(v, x):
        out, _ = model.apply(v, x, train=False)
        return jnp.sum(out)

    timed("infer", lambda: float(infer(variables, x)))

    @jax.jit
    def train(v, x, k):
        (out, _), upd = model.apply(v, x, train=True,
                                    mutable=["batch_stats"],
                                    rngs={"dropout": k})
        return jnp.sum(out) + jnp.sum(
            jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), upd["batch_stats"], 0.0))

    timed("train", lambda: float(train(variables, x, key)))

    # dropout lives only in the ASPP projection (reference …stage.py:82);
    # a rate-0 model shares the same variables
    model_nd = AttentionASPPUNet.from_config(
        ModelConfig(base_c=48, aspp_dropout=0.0))

    @jax.jit
    def train_nodrop(v, x, k):
        (out, _), upd = model_nd.apply(v, x, train=True,
                                       mutable=["batch_stats"],
                                       rngs={"dropout": k})
        return jnp.sum(out)

    timed("train_nodrop", lambda: float(train_nodrop(variables, x, key)))

    with jax.default_prng_impl("rbg"):
        key_rbg = jax.random.PRNGKey(2)

        @jax.jit
        def train_rbg(v, x, k):
            (out, _), upd = model.apply(v, x, train=True,
                                        mutable=["batch_stats"],
                                        rngs={"dropout": k})
            return jnp.sum(out)

        timed("train_rbg", lambda: float(train_rbg(variables, x, key_rbg)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
