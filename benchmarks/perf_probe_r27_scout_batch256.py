"""Probe r27 — scout micro-batch beyond 128 with the DISTILLED scout.

The distilled scout's activations are 1/3 the channel width of the full
model's, so the VMEM ceiling that capped the r24 sweep may sit higher;
A/B cascade_scout_batch ∈ {128, 256} on the 840-frame case (picks are
batch-invariant by construction).
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

    print(f"[r27] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    variables = load_npz_variables(root / "resources/synthetic/weights.npz")
    thr = 0.525
    scout_dir = root / "resources" / "synthetic_scout"
    scal = json.loads((scout_dir / "thr.json").read_text())
    scout_thr = float(scal.get("best_thr_no_tta", scal["best_thr"]))

    base = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=16, tta_hflip=False, cascade=True,
                              cascade_img_size=256, cascade_scouts=32,
                              cascade_lowres_enhance=True,
                              cascade_scout_weights=str(
                                  scout_dir / "weights.npz"),
                              cascade_scout_base_c=16,
                              cascade_scout_thr=scout_thr),
    )
    model = AttentionASPPUNet.from_config(base.model)
    case_np = np.concatenate(
        [make_sweep(140, 562, 744, seed=100 + s)[0] for s in range(6)])
    case = jax.device_put(case_np)
    case.block_until_ready()
    spacing = (0.28, 0.28)

    iters = 6
    results, picks = {}, {}
    for sb in (128, 256):
        cfg = dataclasses.replace(base, predict=dataclasses.replace(
            base.predict, cascade_scout_batch=sb))
        eng = AttAsppEngine(cfg, variables, model=model)
        t0 = time.time()
        f, _, ac = eng.predict_case(case, spacing, threshold=thr)
        picks[sb] = (int(f), round(float(ac), 2))
        print(f"[r27] sb={sb}: compile+warm {time.time()-t0:.1f}s "
              f"pick={picks[sb]}", file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_case_submit(case, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r27] sb={sb}: case disp-only {disp:.3f} s "
              f"({840/disp:.1f} f/s)", file=sys.stderr)
        results[sb] = disp

    assert picks[128] == picks[256], f"picks diverged: {picks}"
    print(json.dumps({"probe": "r27",
                      "case_disp_s": {str(k): round(v, 3)
                                      for k, v in results.items()},
                      "picks_identical": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
