"""Probe r21d — the r21 cascade/direct disagreement: mechanism + who's right.

r21c showed the disagreeing sweep's WINNER promotes fine (scout rank 4),
so the deviation is NOT winner burial.  Remaining hypothesis: a frame of
direct's proxy-top-``n_cand`` is scout-buried, freeing a candidate slot,
so the cascade exactly-evaluates (refine + circularity re-rank) a frame
direct never refined — and that frame wins the re-rank.

This probe (a) verifies that mechanism on the failing sweep by computing
direct's full-res proxy order and the scout order side by side, and (b)
scores BOTH picks against the synthetic generator's analytic ground
truth (true best frame index + Ramanujan circumference of the generating
ellipse) across all 8 agreement sweeps — deciding whether the deviation
is a fidelity loss or a benign near-tie flip.
"""

from __future__ import annotations

import dataclasses
import json
import sys
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
    from att_aspp_unet_tpu.infer.engine import (AttAsppEngine,
                                                _predict_full_impl,
                                                candidate_rank_areas,
                                                enhance_frames,
                                                predict_sweep_probs)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.ops.image import resize_bilinear
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r21d] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(frame_batch=16, tta_hflip=False),
    )
    cas = dataclasses.replace(cfg, predict=dataclasses.replace(
        cfg.predict, cascade=True, cascade_img_size=256, cascade_scouts=32))
    model = AttentionASPPUNet.from_config(cfg.model)
    eng_d = AttAsppEngine(cfg, variables, model=model)
    eng_c = AttAsppEngine(cas, variables, model=model)
    n_cand = cfg.predict.topk_frames + cfg.predict.refine_margin
    spacing = (0.28, 0.28)
    px_mm = 0.28

    @jax.jit
    def both_orders(sweep):
        p = cfg.preprocess
        probs = _predict_full_impl(model.apply, eng_d.variables, sweep, 512,
                                   p.clahe_clip, p.clahe_grid,
                                   p.median_kernel, 16, False,
                                   cfg.predict.gaussian_kernel)
        full_areas = candidate_rank_areas(
            (probs > thr).astype(jnp.uint8), cfg.predict.close_kernel)
        u8 = enhance_frames(sweep, p.clahe_clip, p.clahe_grid,
                            p.median_kernel)
        x_lo = resize_bilinear(u8.astype(jnp.float32), (256, 256)) / 255.0
        probs_lo = predict_sweep_probs(model.apply, eng_d.variables, x_lo,
                                       16, hflip=False)
        lo_areas = candidate_rank_areas(
            (probs_lo > thr).astype(jnp.uint8), cfg.predict.close_kernel)
        return full_areas, lo_areas

    rows = []
    for seed in range(8):
        host, true_idx, truth = make_sweep(140, 562, 744, seed=seed)
        true_ac = truth.circumference_px() * px_mm
        sweep = jax.device_put(host)
        sweep.block_until_ready()
        fd, _, ac_d = eng_d.predict_case(sweep, spacing, threshold=thr)
        fc, _, ac_c = eng_c.predict_case(sweep, spacing, threshold=thr)
        row = {"seed": seed, "true_idx": int(true_idx),
               "true_ac": round(true_ac, 2),
               "direct": [int(fd), round(float(ac_d), 2)],
               "cascade": [int(fc), round(float(ac_c), 2)],
               "err_d": round(abs(float(ac_d) - true_ac), 2),
               "err_c": round(abs(float(ac_c) - true_ac), 2)}
        if int(fd) != int(fc):
            full_areas, lo_areas = both_orders(sweep)
            full_areas = np.asarray(full_areas)
            lo = np.asarray(lo_areas)
            idx = np.arange(140)
            d_order = np.lexsort((-idx, -full_areas))
            s_order = np.lexsort((-idx, -lo))
            s_rank = np.empty(140, int)
            s_rank[s_order] = idx
            d_cand = d_order[:n_cand]
            buried = [(int(f), int(s_rank[f])) for f in d_cand
                      if s_rank[f] >= 32]
            c_extra = int(fc) not in set(d_cand.tolist())
            row["mechanism"] = {
                "direct_cand_scout_buried": buried,
                "cascade_pick_outside_direct_cand": c_extra,
                "cascade_pick_full_rank": int(np.where(
                    d_order == int(fc))[0][0]),
            }
        rows.append(row)
        print(f"[r21d] seed {seed}: true ({true_idx}, {true_ac:.1f}mm)  "
              f"direct {row['direct']} err {row['err_d']}  "
              f"cascade {row['cascade']} err {row['err_c']}"
              + (f"  mech={row.get('mechanism')}" if fd != fc else ""),
              file=sys.stderr)

    med_d = float(np.median([r["err_d"] for r in rows]))
    med_c = float(np.median([r["err_c"] for r in rows]))
    pick_d = sum(r["direct"][0] == r["true_idx"] for r in rows)
    pick_c = sum(r["cascade"][0] == r["true_idx"] for r in rows)
    print(f"[r21d] median AC err: direct {med_d:.2f} mm, cascade "
          f"{med_c:.2f} mm; exact true-frame picks d={pick_d} c={pick_c}",
          file=sys.stderr)
    print(json.dumps({"probe": "r21d", "rows": rows,
                      "median_err_direct_mm": round(med_d, 2),
                      "median_err_cascade_mm": round(med_c, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
