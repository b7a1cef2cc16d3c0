"""Probe r21c — why did the scout drop the direct winner (r21/r21b)?

r21 (scouts=32) and r21b (scouts=48) both disagree with direct on the
SAME sweep (seed 3): direct picks frame 83, the cascade never promotes
it, so more scouts is not the fix — the scout's rank key buries it.

For every r21 agreement sweep this probe locates direct's winning frame
inside several candidate scout orderings:

- ``thr``      — current: low-res probs > calibrated thr, closed area
- ``thr75``    — threshold scaled to 0.75·thr (low-res probability fields
                 are smoothed, so thin rims fall below the full-res thr)
- ``thr50``    — 0.50·thr
- ``soft``     — threshold-free: sum of probs (soft area)
- ``blur+thr`` — 5×5 Gaussian on low-res probs first (mirrors the direct
                 path, which blurs at native res before thresholding)

The decision metric is the WORST (max) rank of the direct winner across
sweeps per variant: any variant whose worst rank sits well inside
``cascade_scouts`` with margin promotes the winner everywhere and makes
cascade == direct on these sweeps.
"""

from __future__ import annotations

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
                                                candidate_rank_areas,
                                                enhance_frames,
                                                predict_sweep_probs)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.ops.image import gaussian_blur, resize_bilinear
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r21c] backend={jax.default_backend()}", file=sys.stderr)
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
    model = AttentionASPPUNet.from_config(cfg.model)
    engine = AttAsppEngine(cfg, variables, model=model)
    low = 256

    @jax.jit
    def scout_scores(sweep):
        u8 = enhance_frames(sweep, cfg.preprocess.clahe_clip,
                            cfg.preprocess.clahe_grid,
                            cfg.preprocess.median_kernel)
        xf = u8.astype(jnp.float32)
        x_lo = resize_bilinear(xf, (low, low)) / 255.0
        probs = predict_sweep_probs(model.apply, engine.variables, x_lo,
                                    16, hflip=False)
        ck = cfg.predict.close_kernel
        out = {}
        for name, p, t in (
            ("thr", probs, thr),
            ("thr75", probs, 0.75 * thr),
            ("thr50", probs, 0.50 * thr),
            ("blur+thr", gaussian_blur(probs, 5, 0.0), thr),
        ):
            out[name] = candidate_rank_areas(
                (p > t).astype(jnp.uint8), ck)
        out["soft"] = probs.sum(axis=(-2, -1))
        return out

    variants = ["thr", "thr75", "thr50", "soft", "blur+thr"]
    worst = {v: -1 for v in variants}
    rows = []
    for seed in range(8):
        host, _, _ = make_sweep(140, 562, 744, seed=seed)
        sweep = jax.device_put(host)
        sweep.block_until_ready()
        winner, _, _ = engine.predict_case(sweep, (0.28, 0.28),
                                           threshold=thr)
        winner = int(winner)
        scores = {k: np.asarray(v) for k, v in scout_scores(sweep).items()}
        row = {"seed": seed, "winner": winner}
        for v in variants:
            order = np.lexsort((-np.arange(140), -scores[v]))
            rank = int(np.where(order == winner)[0][0])
            row[v] = rank
            worst[v] = max(worst[v], rank)
        rows.append(row)
        print(f"[r21c] seed {seed}: winner {winner:3d}  ranks "
              + "  ".join(f"{v}={row[v]}" for v in variants),
              file=sys.stderr)

    print(f"[r21c] worst rank across sweeps (needs < cascade_scouts=32): "
          + "  ".join(f"{v}={worst[v]}" for v in variants), file=sys.stderr)
    print(json.dumps({"probe": "r21c", "low": low, "thr": thr,
                      "worst_rank": worst, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
