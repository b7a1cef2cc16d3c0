"""Probe r24 — scout-tier micro-batch sweep (cascade serving).

After r23 the scout forward dominates the cascade's device time (~0.7 s
of the 1.01 s 840-frame case).  At the 256² scout resolution the
activations are 1/4 the full-res size, so a larger micro-batch may fill
the MXU better (the 48-channel stages underfill lanes — probe r15)
without VMEM pressure.  A/B ``cascade_scout_batch`` ∈ {16, 32, 64} on
the production path (trained weights, calibrated threshold), sweep and
case shapes, dispatch-only (the batch is an in-graph detail; outputs are
bit-identical by construction — frames are independent).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r24] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    spacing = (0.28, 0.28)

    base = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=16, tta_hflip=False, cascade=True,
                              cascade_img_size=256, cascade_scouts=32),
    )
    model = AttentionASPPUNet.from_config(base.model)

    host_sweep, _, _ = make_sweep(140, 562, 744, seed=0)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()
    case_np = np.concatenate(
        [make_sweep(140, 562, 744, seed=100 + s)[0] for s in range(6)])
    case = jax.device_put(case_np)
    case.block_until_ready()

    iters = 5
    results = {}
    picks = {}
    for sb in (16, 32, 64):
        cfg = dataclasses.replace(base, predict=dataclasses.replace(
            base.predict, cascade_scout_batch=sb))
        eng = AttAsppEngine(cfg, variables, model=model)
        t0 = time.time()
        f, _, ac = eng.predict_case(sweep, spacing, threshold=thr)
        picks[sb] = (int(f), round(float(ac), 2))
        print(f"[r24] sb={sb}: sweep compile+warm {time.time()-t0:.1f}s "
              f"pick={picks[sb]}", file=sys.stderr)

        n_disp = 2 * iters
        t0 = time.time()
        handles = [eng.predict_case_submit(sweep, thr)
                   for _ in range(n_disp)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / n_disp
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r24] sb={sb}: sweep dispatch-only {disp:.3f} s "
              f"({140/disp:.1f} f/s)", file=sys.stderr)

        t0 = time.time()
        eng.predict_case(case, spacing, threshold=thr)
        print(f"[r24] sb={sb}: case compile+warm {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_case_submit(case, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        cdisp = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r24] sb={sb}: case-840 dispatch-only {cdisp:.3f} s "
              f"({840/cdisp:.1f} f/s)", file=sys.stderr)
        results[sb] = dict(sweep_disp=disp, case_disp=cdisp)

    assert len({p for p in picks.values()}) == 1, f"picks diverged: {picks}"
    best = min(results, key=lambda k: results[k]["case_disp"])
    print(f"[r24] SUMMARY {json.dumps({str(k): v for k, v in results.items()})} "
          f"best sb={best}; picks identical {picks[16]}", file=sys.stderr)
    print(json.dumps({"probe": "r24",
                      "results": {str(k): v for k, v in results.items()},
                      "picks_identical": True, "best_scout_batch": best}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
