"""Threshold calibration.

Reference behavior (``…stage.py:376-396`` and the CI variant
``test_ablation.py:684-761``): sweep probability thresholds over the val set,
pick the argmax of mean Dice, write ``thr.json``.

Design fixes over the reference (SURVEY.md §7 "quirks to NOT replicate"): the
reference re-ran every TTA forward pass for each of the 17 thresholds AND ran
the val set one image at a time (``…stage.py:383-392``).  Here the val set is
batched by native resolution into whole-set device programs — probabilities
for every image in a resolution group come from ONE ``predict_full`` dispatch
and the full (n_images × n_thresholds) Dice surface from ONE vmapped
reduction, so the dispatch count is 2 per distinct resolution (normally 2
total), independent of n_val and n_thresholds.  The old per-image loop paid
~5 tunnel round-trips (~0.25 s) per image.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config
from ..io import read_gray_png, write_json


@jax.jit
def dice_curve(probs: jax.Array, gt: jax.Array, thresholds: jax.Array
               ) -> jax.Array:
    """Per-threshold Dice of one (H, W) probability map vs binary GT."""
    g = (gt > 0).astype(jnp.float32)
    m = (probs[None] > thresholds[:, None, None]).astype(jnp.float32)
    inter = jnp.sum(m * g, axis=(1, 2))
    return 2.0 * inter / (jnp.sum(m, axis=(1, 2)) + jnp.sum(g) + 1e-7)


@jax.jit
def dice_curves(probs: jax.Array, gts: jax.Array, thresholds: jax.Array
                ) -> jax.Array:
    """(n, H, W) probabilities × (n, H, W) GT → (n, n_thr) Dice surface."""
    return jax.vmap(lambda p, g: dice_curve(p, g, thresholds))(probs, gts)


def calibrate(cfg: Config, variables: dict, val_dir: Path, output_dir: Path,
              log=print) -> dict:
    """Scan thresholds over ``<val_dir>/images/*.png`` vs ``<val_dir>/masks``;
    write ``<output_dir>/thr.json``.  Returns the result dict.

    NOTE on TTA parity: the reference's calibrate ran hflip-TTA forwards
    (``…stage.py:384-392``) but ``PredictConfig.tta_hflip`` defaults to
    False (the deployment/ROI default).  The ``calibrate`` CLI subcommand
    turns TTA on; direct library callers wanting reference-parity curves
    must pass a config with ``predict.tta_hflip=True`` themselves.
    """
    from .engine import AttAsppEngine

    ccfg = cfg.calibrate
    engine = AttAsppEngine(cfg, variables)

    val_dir = Path(val_dir)
    imgs = sorted((val_dir / "images").glob("*.png"))
    if not imgs:
        raise FileNotFoundError(f"no PNGs under {val_dir/'images'}")

    thrs = np.linspace(ccfg.thr_lo, ccfg.thr_hi, ccfg.thr_steps)
    thrs_j = jnp.asarray(thrs, jnp.float32)

    # Load everything host-side, group by native resolution: each group is
    # one batched predict_full program + one Dice-surface reduction.
    frames = [read_gray_png(ip) for ip in imgs]
    gts = [read_gray_png(val_dir / "masks" / ip.name) > 127 for ip in imgs]
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, f in enumerate(frames):
        groups.setdefault(f.shape, []).append(i)

    curves = np.empty((len(imgs), len(thrs)), np.float64)
    for shape, idxs in groups.items():
        probs = engine.predict_full(np.stack([frames[i] for i in idxs]))
        gt_stack = jnp.asarray(np.stack([gts[i] for i in idxs]))
        curves[idxs] = np.asarray(dice_curves(probs, gt_stack, thrs_j))
    means = curves.mean(axis=0)
    best_idx = int(np.argmax(means))
    best_thr = float(thrs[best_idx])

    out = {"best_thr": best_thr}
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    write_json(output_dir / "thr.json", out, indent=2)
    log(f"Calibrated thr={best_thr:.3f} (mean Dice {means[best_idx]:.4f})")

    if ccfg.with_ci:
        _write_ci_outputs(thrs, curves, output_dir, log)
    return {"best_thr": best_thr, "thresholds": thrs, "mean_dice": means,
            "curves": curves}


def _write_ci_outputs(thrs: np.ndarray, curves: np.ndarray, out_dir: Path,
                      log=print) -> None:
    """CI variant (``test_ablation.py:700-761``): per-threshold mean/std/
    median + t-distribution 95 % CI, curve/raw CSVs, two plots."""
    import csv

    from scipy import stats

    n = curves.shape[0]
    means = curves.mean(axis=0)
    stds = curves.std(axis=0, ddof=1) if n > 1 else np.zeros_like(means)
    medians = np.median(curves, axis=0)
    half = stats.t.ppf(0.975, max(n - 1, 1)) * stds / np.sqrt(max(n, 1))

    with open(out_dir / "calibrate_curve.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["thr", "mean_dice", "std", "median", "ci95_lo", "ci95_hi"])
        for i, t in enumerate(thrs):
            w.writerow([f"{t:.4f}", f"{means[i]:.6f}", f"{stds[i]:.6f}",
                        f"{medians[i]:.6f}", f"{means[i]-half[i]:.6f}",
                        f"{means[i]+half[i]:.6f}"])
    with open(out_dir / "calibrate_raw.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_idx"] + [f"thr_{t:.4f}" for t in thrs])
        for i, row in enumerate(curves):
            w.writerow([i] + [f"{v:.6f}" for v in row])

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(thrs, means, marker="o", label="mean Dice")
        ax.fill_between(thrs, means - half, means + half, alpha=0.3,
                        label="95% CI")
        ax.set_xlabel("threshold")
        ax.set_ylabel("Dice")
        ax.legend()
        fig.savefig(out_dir / "calibrate_curve.png", dpi=200,
                    bbox_inches="tight")
        plt.close(fig)

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.boxplot(list(curves.T), positions=np.round(thrs, 3), widths=0.01)
        ax.set_xlabel("threshold")
        ax.set_ylabel("per-image Dice")
        fig.savefig(out_dir / "calibrate_box.png", dpi=200,
                    bbox_inches="tight")
        plt.close(fig)
    except Exception as e:  # pragma: no cover - plotting is best-effort
        log(f"plotting skipped: {e}")
