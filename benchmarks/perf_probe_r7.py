#!/usr/bin/env python
"""Round-2 probe, part 5: product-level fast-forward vs flax forward.

Times the full 140-frame sweep forward (512², micro-batch 32, no TTA) two
ways in one process:

- flax:  ``AttentionASPPUNet.apply`` (the round-1 path, ~270 f/s)
- fast:  ``infer/fast_forward.make_fast_apply`` — BN-folded packed plan,
  NCHW fused Pallas conv pairs at the 128-lane levels, tap-matmul elsewhere

and checks they agree (max |Δlogit|).  Prints name / compile_s / median fps.
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
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--base-c", type=int, default=48)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-flax", action="store_true")
    args = ap.parse_args()

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.config import ModelConfig
    from att_aspp_unet_tpu.infer import fast_forward as ff
    from att_aspp_unet_tpu.infer.engine import predict_sweep_probs
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr, flush=True)

    model = AttentionASPPUNet.from_config(ModelConfig(base_c=args.base_c))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.img_size, args.img_size, 1), jnp.float32),
        train=False)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random(
        (args.frames, args.img_size, args.img_size)).astype(np.float32))
    x.block_until_ready()

    def timed(name, run):
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
              f"fps={args.frames / med:6.1f}", flush=True)

    # --- flax path
    if not args.skip_flax:
        apply_fn = lambda v, inp: model.apply(v, inp, train=False)
        timed("flax", lambda: float(jnp.sum(predict_sweep_probs(
            apply_fn, variables, x, args.batch, False))))

    # --- fast path
    plan = ff.pack_variables(model, variables)
    plan = jax.device_put(plan)
    fast_apply = ff.make_fast_apply(model)
    timed("fast", lambda: float(jnp.sum(predict_sweep_probs(
        fast_apply, plan, x, args.batch, False))))

    # --- parity on one micro-batch
    xb = x[:args.batch][..., None]
    ref = model.apply(variables, xb, train=False)
    got = fast_apply(plan, xb)
    d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                              got.astype(jnp.float32))))
    print(f"parity max|dlogit| = {d:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
