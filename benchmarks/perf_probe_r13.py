"""Probe r13 — hide the collect-side pull with async host copies.

r12 measured: dispatch-only 0.667 s/sweep, depth-2 pipeline 0.793 — the
0.126 s delta is the device→host pull + round-trip that does NOT overlap
device compute through the axon tunnel (depth 3/4 don't help, so it's
serialization, not queue depth).  Hypothesis: calling
``copy_to_host_async()`` on a sweep's result arrays right after submitting
the NEXT sweep lets the transfer drain while the device computes, so the
eventual ``device_get`` finds host-resident data.

Also logs wall time to first compile as a cross-process compile-cache
health check (r12/bench each paid ~25 min for programs the previous
process had just compiled).
"""

from __future__ import annotations

import argparse
import sys
import time
from collections import deque
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--frames", type=int, default=140)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    wall0 = time.time()
    print(f"[r13] backend={jax.default_backend()}", file=sys.stderr)
    cfg = Config(preprocess=PreprocessConfig(), model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=16))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 1), jnp.float32),
                           train=False)
    print(f"[r13] init done at +{time.time() - wall0:.0f}s", file=sys.stderr)
    engine = AttAsppEngine(cfg, variables)
    rng = np.random.default_rng(0)
    sweep = jax.device_put((rng.random(
        (args.frames, 562, 744)) * 255).astype(np.uint8))
    sweep.block_until_ready()

    warm = engine.predict_full(sweep)
    print(f"[r13] predict_full warm at +{time.time() - wall0:.0f}s",
          file=sys.stderr)
    thr = float(jnp.quantile(warm.astype(jnp.float32), 0.97))
    engine.predict_case_collect(engine.predict_case_submit(sweep, thr),
                                (0.28, 0.28))
    print(f"[r13] predict_case warm at +{time.time() - wall0:.0f}s",
          file=sys.stderr)

    n = args.iters

    def run_depth2(async_copy: bool) -> float:
        q = deque([engine.predict_case_submit(sweep, thr)])
        if async_copy:
            for a in q[0][:2]:
                a.copy_to_host_async()
        t0 = time.time()
        for _ in range(n):
            h = engine.predict_case_submit(sweep, thr)
            if async_copy:
                for a in h[:2]:
                    a.copy_to_host_async()
            q.append(h)
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        while q:
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        return (time.time() - t0) / (n + 1)

    for label, mode in (("plain", False), ("async-copy", True),
                        ("plain2", False), ("async-copy2", True)):
        per = run_depth2(mode.__bool__() if isinstance(mode, bool) else mode)
        print(f"[r13] depth2 {label}: {per:.3f} s/sweep "
              f"({args.frames / per:.1f} f/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
