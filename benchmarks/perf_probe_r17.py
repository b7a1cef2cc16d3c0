#!/usr/bin/env python
"""Probe r17 — attribute the pipelined-vs-dispatch-only gap of the e2e
serving path (bench.py e2e mode).

This session's bench: dispatch-only 0.586 s/sweep, pipelined depth-2
0.805 s/sweep — 0.22 s/sweep unaccounted.  Candidate costs per collect:
  (a) device_get of (cand_idx, packed masks)  [tunnel RT + ~0.4 MB]
  (b) np.unpackbits of the candidates
  (c) select_best_frame_exact: host contour trace of topk masks (1-core!)
  (d) measure_ac_mm ellipse fit of the winner
  (e) predict_case_submit host overhead (trace-cache hit + dispatch)
Run on the real TPU: python benchmarks/perf_probe_r17.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
    PreprocessConfig  # noqa: E402
from att_aspp_unet_tpu.infer.engine import AttAsppEngine  # noqa: E402
from att_aspp_unet_tpu.models import AttentionASPPUNet  # noqa: E402
from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables  # noqa: E402
from att_aspp_unet_tpu.tools.synthetic import make_sweep  # noqa: E402
from att_aspp_unet_tpu.postprocess import select_best_frame_exact  # noqa: E402


def med(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2]


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    syn = Path(__file__).resolve().parent.parent / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    thr = float(json.loads((syn / "thr.json").read_text())["best_thr"])
    cfg = Config(preprocess=PreprocessConfig(img_size=512),
                 model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=16, tta_hflip=False))
    engine = AttAsppEngine(cfg, variables)
    host_sweep, _, _ = make_sweep(140, 562, 744, seed=0)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()

    h = engine.predict_case_submit(sweep, thr)   # compile + warm
    engine.predict_case_collect(h, (0.28, 0.28))

    # (e) submit host overhead: submit is async; time the call itself
    t_submit = med(lambda: engine.predict_case_submit(sweep, thr))
    print(f"(e) submit-call host overhead: {t_submit*1e3:.1f} ms")

    # drain the queue from (e)'s submits
    jax.block_until_ready(engine.predict_case_submit(sweep, thr)[:2])

    # (a) device_get after the handle is already ready (pure transfer + RT)
    h = engine.predict_case_submit(sweep, thr)
    jax.block_until_ready(h[:2])
    t_get = med(lambda: jax.device_get((h[0], h[1])))
    cand_idx, packed = jax.device_get((h[0], h[1]))
    nbytes = packed.nbytes + cand_idx.nbytes
    print(f"(a) device_get of ready handle: {t_get*1e3:.1f} ms "
          f"({nbytes/1e6:.2f} MB → {nbytes/1e6/max(t_get,1e-9):.0f} MB/s)")

    # (b) unpackbits
    W = h[2]
    t_unpack = med(lambda: np.unpackbits(packed, axis=-1, count=W))
    refined = np.unpackbits(packed, axis=-1, count=W)
    print(f"(b) unpackbits {packed.shape}: {t_unpack*1e3:.1f} ms")

    # (c) exact select over the candidates
    t_sel = med(lambda: select_best_frame_exact(refined, 5))
    local = select_best_frame_exact(refined, 5)
    print(f"(c) select_best_frame_exact over {refined.shape[0]} cands: "
          f"{t_sel*1e3:.1f} ms")

    # (d) ellipse fit
    t_ac = med(lambda: engine.measure(refined[local], (0.28, 0.28)))
    print(f"(d) measure_ac_mm: {t_ac*1e3:.1f} ms")

    # full collect on a fresh ready handle
    h = engine.predict_case_submit(sweep, thr)
    jax.block_until_ready(h[:2])
    t_collect = med(lambda: engine.predict_case_collect(h, (0.28, 0.28)))
    print(f"full collect (ready handle): {t_collect*1e3:.1f} ms")

    # reference points: device time (dispatch-only) and pipelined loop
    n_disp = 6
    t0 = time.time()
    handles = [engine.predict_case_submit(sweep, thr) for _ in range(n_disp)]
    jax.block_until_ready(handles[-1][:2])
    disp = (time.time() - t0) / n_disp
    for hh in handles:
        engine.predict_case_collect(hh, (0.28, 0.28))
    print(f"dispatch-only: {disp*1e3:.1f} ms/sweep")

    from collections import deque
    for depth in (2, 3):
        q = deque(engine.predict_case_submit(sweep, thr)
                  for _ in range(depth))
        iters = 6
        t0 = time.time()
        for _ in range(iters):
            q.append(engine.predict_case_submit(sweep, thr))
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        while q:
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        per = (time.time() - t0) / (iters + depth)
        print(f"pipelined depth-{depth}: {per*1e3:.1f} ms/sweep")


if __name__ == "__main__":
    main()
