"""Probe r36 — bulk grouping at the CASE shape (840 frames).

r35 measured ``predict_bulk`` on 140-frame sweeps: the ~30 ms
amortizable fixed block of a sweep-pick workload bought ×1.5 at S=4.
The deployment unit is the 840-frame challenge case (the container's
input — ``inference.py:147-190`` loads the whole stacked .mha), whose
lean-cascade cost is ~87 ms (r33) with a scout marginal of only
~11 ms/700 extra frames — i.e. MOST of a case call is the same
amortizable tier-2/refine/glue block.  Expected: S cases per program
approach the sweep-bulk marginal, lifting cases/s ~×1.3–1.5.

HBM bound: the scout tier materializes the f32 (S·840, H, W) stack
(~2.8 GB per case at 562×744) — S is probed upward until allocation
fails, and the failure is recorded, not fatal.

Matrix (trained weights, shipping lean nc128 config, fb16):
  - baseline: sequential 840-frame ``predict_case`` submits
  - bulk S ∈ {2, 3} of 840-frame cases
  - fidelity: bulk picks vs per-case picks, 6 seeds in groups of 2
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASE_FRAMES = 840
H, W = 562, 744


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r36] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scout_dir = root / "resources" / "synthetic_scout_noclahe128"
    s_thr = float(json.loads((scout_dir / "thr.json").read_text())["best_thr"])

    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=128, cascade_scouts=8, bulk_frame_batch=16,
            cascade_scout_weights=str(scout_dir / "weights.npz"),
            cascade_scout_base_c=16, cascade_scout_clahe=False,
            cascade_scout_thr=s_thr))

    cases = [make_sweep(CASE_FRAMES, H, W, seed=360 + s)[0] for s in range(6)]
    spacing = (0.28, 0.28)
    iters = 4

    eng = AttAsppEngine(cfg, variables)
    case0 = jax.device_put(cases[0])
    eng.predict_case(case0, spacing, threshold=thr)
    t0 = time.time()
    handles = [eng.predict_case_submit(case0, thr) for _ in range(iters)]
    float(jnp.sum(handles[-1][0].astype(jnp.int32)))
    single = (time.time() - t0) / iters
    for h in handles:
        eng.predict_case_collect(h, spacing)
    print(f"[r36] single case dispatch-only {single:.3f} s "
          f"({CASE_FRAMES / single:.0f} f/s, {1 / single:.1f} cases/s)",
          file=sys.stderr)

    perf = {"single_case_s": round(single, 4)}
    for S in (2, 3):
        try:
            group = jax.device_put(np.stack(cases[:S]))
            group.block_until_ready()
            t0 = time.time()
            eng.predict_bulk_collect(eng.predict_bulk_submit(group, thr),
                                     spacing)
            print(f"[r36] bulk S={S} compile+warm {time.time() - t0:.1f}s",
                  file=sys.stderr)
            t0 = time.time()
            handles = [eng.predict_bulk_submit(group, thr)
                       for _ in range(iters)]
            float(jnp.sum(handles[-1][0].astype(jnp.int32)))
            dt = (time.time() - t0) / iters
            for h in handles:
                eng.predict_bulk_collect(h, spacing)
        except Exception as e:          # RESOURCE_EXHAUSTED expected at some S
            perf[f"bulk_S{S}"] = {"error": type(e).__name__,
                                  "msg": str(e)[:200]}
            print(f"[r36] bulk S={S} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            break
        fps = S * CASE_FRAMES / dt
        perf[f"bulk_S{S}"] = {
            "group_s": round(dt, 4), "fps": round(fps, 1),
            "cases_per_s": round(S / dt, 2),
            "vs_sequential": round(S * single / dt, 2)}
        print(f"[r36] bulk S={S}: {dt:.3f} s/group ({fps:.0f} f/s, "
              f"{S / dt:.1f} cases/s, ×{S * single / dt:.2f} vs sequential)",
              file=sys.stderr)

    # ---- fidelity: bulk vs per-case picks, 6 seeds in groups of 2 ----
    agree = 0
    for g in range(3):
        group = np.stack(cases[2 * g:2 * g + 2])
        bulk = eng.predict_bulk(group, spacing, threshold=thr)
        for i in range(2):
            f_ref, _, _ = eng.predict_case(
                jax.device_put(group[i]), spacing, threshold=thr)
            agree += int(bulk[i][0] == f_ref)
    print(f"[r36] bulk vs per-case pick agreement: {agree}/6",
          file=sys.stderr)

    print(json.dumps({"probe": "r36", "perf": perf,
                      "pick_agreement_of_6": agree}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
