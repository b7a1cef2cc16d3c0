"""Probe r35 — bulk multi-sweep cascade serving on hardware.

r33/r34: the lean cascade pays a ~76 ms n-independent fixed block per
call (tier-2 micro-batch, latency-bound refine, glue), so S isolated
140-frame sweeps cost S×76 ms + marginal.  ``predict_bulk`` runs S
sweeps through ONE program with per-sweep promotion/selection and a
shared tier-2/refine.  Expected: group time ≪ S × single time, with
per-sweep outputs exactly matching per-case calls (proven bit-exact on
CPU; batch shapes differ on TPU, so agreement is MEASURED here too).

Matrix (trained weights, nc128 scout, shipping lean config):
  - S ∈ {2, 4, 8} at bulk_frame_batch 16
  - bulk_frame_batch ∈ {8, 16, 32} at S=4
  - baseline: the single-sweep lean cascade (S sequential submits)
  - fidelity: bulk picks vs per-case picks, 12 seeds in groups of 4
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SWEEP_FRAMES = 140
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

    print(f"[r35] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scout_dir = root / "resources" / "synthetic_scout_noclahe128"
    s_thr = float(json.loads((scout_dir / "thr.json").read_text())["best_thr"])

    def make_cfg(bulk_fb: int) -> Config:
        return Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48),
            predict=PredictConfig(
                frame_batch=16, tta_hflip=False, cascade=True,
                cascade_img_size=128, cascade_scouts=8,
                bulk_frame_batch=bulk_fb,
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=16, cascade_scout_clahe=False,
                cascade_scout_thr=s_thr))

    sweeps = [make_sweep(SWEEP_FRAMES, H, W, seed=300 + s)[0]
              for s in range(12)]
    spacing = (0.28, 0.28)
    iters = 6

    # ---- baseline: sequential lean single-sweep submits ----
    eng = AttAsppEngine(make_cfg(16), variables)
    sweep0 = jax.device_put(sweeps[0])
    eng.predict_case(sweep0, spacing, threshold=thr)
    t0 = time.time()
    handles = [eng.predict_case_submit(sweep0, thr) for _ in range(iters)]
    float(jnp.sum(handles[-1][0].astype(jnp.int32)))
    single = (time.time() - t0) / iters
    for h in handles:
        eng.predict_case_collect(h, spacing)
    print(f"[r35] single sweep dispatch-only {single:.3f} s "
          f"({SWEEP_FRAMES / single:.0f} f/s)", file=sys.stderr)

    # ---- bulk S sweep at fb=16 ----
    perf = {"single_s": round(single, 4)}
    for S in (2, 4, 8):
        group = jax.device_put(np.stack(sweeps[:S]))
        group.block_until_ready()
        t0 = time.time()
        eng.predict_bulk_collect(eng.predict_bulk_submit(group, thr),
                                 spacing)
        print(f"[r35] bulk S={S} compile+warm {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        handles = [eng.predict_bulk_submit(group, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        dt = (time.time() - t0) / iters
        for h in handles:
            eng.predict_bulk_collect(h, spacing)
        fps = S * SWEEP_FRAMES / dt
        perf[f"bulk_S{S}_fb16"] = {
            "group_s": round(dt, 4), "fps": round(fps, 1),
            "sweeps_per_s": round(S / dt, 2),
            "vs_sequential": round(S * single / dt, 2)}
        print(f"[r35] bulk S={S} fb16: {dt:.3f} s/group ({fps:.0f} f/s, "
              f"×{S * single / dt:.2f} vs sequential)", file=sys.stderr)

    # ---- tier-2 micro-batch sweep at S=4 ----
    group4 = jax.device_put(np.stack(sweeps[:4]))
    group4.block_until_ready()
    for fb in (8, 32):
        e = AttAsppEngine(make_cfg(fb), variables)
        e.predict_bulk_collect(e.predict_bulk_submit(group4, thr), spacing)
        t0 = time.time()
        handles = [e.predict_bulk_submit(group4, thr) for _ in range(iters)]
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        dt = (time.time() - t0) / iters
        for h in handles:
            e.predict_bulk_collect(h, spacing)
        perf[f"bulk_S4_fb{fb}"] = {
            "group_s": round(dt, 4),
            "fps": round(4 * SWEEP_FRAMES / dt, 1)}
        print(f"[r35] bulk S=4 fb{fb}: {dt:.3f} s/group "
              f"({4 * SWEEP_FRAMES / dt:.0f} f/s)", file=sys.stderr)

    # ---- fidelity: bulk vs per-case picks over 12 seeds (groups of 4) ----
    agree = 0
    for g in range(3):
        group = np.stack(sweeps[4 * g:4 * g + 4])
        bulk = eng.predict_bulk(group, spacing, threshold=thr)
        for i in range(4):
            f_ref, _, _ = eng.predict_case(
                jax.device_put(group[i]), spacing, threshold=thr)
            agree += int(bulk[i][0] == f_ref)
    print(f"[r35] bulk vs per-case pick agreement: {agree}/12",
          file=sys.stderr)

    print(json.dumps({"probe": "r35", "perf": perf,
                      "pick_agreement_of_12": agree}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
