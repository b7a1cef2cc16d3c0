"""Probe r12 — e2e serving: where do the 0.18 s/sweep of non-device time go?

Round-2 closed at 177.8 f/s steady-state (0.80 s/sweep) against ~0.62 s of
measured device time (NOTES.md).  VERDICT r2 #2 asks for (a) a DISPATCH-ONLY
number that pins how much of the gap is axon-tunnel artifact vs real, and
(b) a deeper submit/collect pipeline.  This probe measures, on the real TPU:

1. dispatch-only: submit N sweeps back-to-back, block once at the end —
   pure device throughput with zero per-sweep host work;
2. pipeline depth 1 (sequential), 2, 3, 4 — full predict_case_collect per
   sweep (transfer + exact select + ellipse AC on host);
3. the submit-side host cost alone (no device wait).

Usage: python benchmarks/perf_probe_r12.py [--iters 8]
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
    ap.add_argument("--height", type=int, default=562)
    ap.add_argument("--width", type=int, default=744)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    print(f"[r12] backend={jax.default_backend()}", file=sys.stderr)
    cfg = Config(preprocess=PreprocessConfig(),
                 model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=16))
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 1), jnp.float32),
                           train=False)
    engine = AttAsppEngine(cfg, variables)
    rng = np.random.default_rng(0)
    sweep = jax.device_put((rng.random(
        (args.frames, args.height, args.width)) * 255).astype(np.uint8))
    sweep.block_until_ready()

    warm = engine.predict_full(sweep)
    thr = float(jnp.quantile(warm.astype(jnp.float32), 0.97))
    t0 = time.time()
    engine.predict_case_collect(engine.predict_case_submit(sweep, thr),
                                (0.28, 0.28))
    print(f"[r12] compile+warm {time.time() - t0:.1f}s", file=sys.stderr)

    n = args.iters

    # 1. dispatch-only: one readback at the very end
    handles = []
    t0 = time.time()
    for _ in range(n):
        handles.append(engine.predict_case_submit(sweep, thr))
    # force completion of the LAST handle's arrays (device queue is FIFO)
    jax.block_until_ready(handles[-1][:2])
    _ = float(jnp.sum(handles[-1][0].astype(jnp.int32)))
    disp = (time.time() - t0) / n
    print(f"[r12] dispatch-only: {disp:.3f} s/sweep "
          f"({args.frames / disp:.1f} f/s)")
    del handles

    # 2. submit-side host cost alone (no wait at all)
    t0 = time.time()
    hs = [engine.predict_case_submit(sweep, thr) for _ in range(n)]
    submit_host = (time.time() - t0) / n
    jax.block_until_ready(hs[-1][:2])
    del hs
    print(f"[r12] submit host-side: {submit_host:.3f} s/sweep")

    # 3. pipeline depths
    for depth in (1, 2, 3, 4):
        q = deque(engine.predict_case_submit(sweep, thr)
                  for _ in range(depth - 1))
        t0 = time.time()
        for _ in range(n):
            q.append(engine.predict_case_submit(sweep, thr))
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        while q:
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        per = (time.time() - t0) / (n + depth - 1)
        print(f"[r12] depth {depth}: {per:.3f} s/sweep "
              f"({args.frames / per:.1f} f/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
