"""Probe r24b — scout batch beyond 64 (r24's trend hadn't flattened).

Case-shape only (the sweep is fixed-cost bound); sb ∈ {96, 128}.
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

    print(f"[r24b] backend={jax.default_backend()}", file=sys.stderr)
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
    case_np = np.concatenate(
        [make_sweep(140, 562, 744, seed=100 + s)[0] for s in range(6)])
    case = jax.device_put(case_np)
    case.block_until_ready()

    iters = 5
    results = {}
    for sb in (96, 128):
        cfg = dataclasses.replace(base, predict=dataclasses.replace(
            base.predict, cascade_scout_batch=sb))
        eng = AttAsppEngine(cfg, variables, model=model)
        t0 = time.time()
        f, _, ac = eng.predict_case(case, spacing, threshold=thr)
        print(f"[r24b] sb={sb}: case compile+warm {time.time()-t0:.1f}s "
              f"pick=({int(f)}, {float(ac):.2f})", file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_case_submit(case, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        cdisp = (time.time() - t0) / iters
        for h in handles:
            eng.predict_case_collect(h, spacing)
        print(f"[r24b] sb={sb}: case-840 dispatch-only {cdisp:.3f} s "
              f"({840/cdisp:.1f} f/s)", file=sys.stderr)
        results[sb] = cdisp

    print(json.dumps({"probe": "r24b",
                      "case_disp": {str(k): round(v, 4)
                                    for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
