"""Abdominal-circumference agreement analysis (GT vs model predictions).

Capability parity with ``/root/reference/analyze_ac.py:14-125`` — sweep-aware
matching of per-sweep ground-truth AC values against per-frame predictions,
per-model error metrics (MAE/RMSE/MAPE/Pearson-r), paired significance tests
between two models, and agreement plots — restructured the framework's way:

* the wide GT table is parsed column-by-column with a regex (no ``melt``);
* error metrics live in one declarative ``ERROR_METRICS`` table evaluated
  over NumPy arrays (the same shape as ``seg_metrics.METRICS``);
* paired statistics are a reusable ``paired_tests`` helper;
* plotting walks a figure-spec table instead of inline plt calls.

File contracts kept verbatim (shared with the reference's downstream use):
``merged_ac_values.csv`` (error columns ``abs_err/sq_err/ape_%`` as the
reference writes them, plus a signed ``err_mm``), ``metrics.csv`` (rows =
model in alphabetical order, columns ``MAE_mm/RMSE_mm/MAPE_pct/Corr_r``),
``stats.txt``, ``scatter_<model>.png``, ``bland_alt_<model>.png``,
``error_hist.png``.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Callable, Dict, Sequence, Tuple

import numpy as np
import pandas as pd
from scipy import stats as ss

# GT table: one row per case, AC columns named like ``sweep_3_ac_mm``
# (reference GT file ``ac_result/gt/fetal_abdominal_circumferences_per_sweep.csv``).
_AC_COLUMN = re.compile(r"(\d+).*_ac_mm$")
_PRED_COLUMNS = ("case_id", "frame_idx", "ac_mm")


# ------------------------------------------------------------------ parsing

def frame_to_sweep(frame_idx, frames_per_sweep: int):
    """1-based sweep index of a global frame index.

    A case stacks six 140-frame sweeps, so ``frame // fps + 1`` recovers
    which sweep a predicted frame belongs to (reference ``analyze_ac.py:54``).
    """
    return np.asarray(frame_idx) // int(frames_per_sweep) + 1


def melt_gt(df: pd.DataFrame) -> pd.DataFrame:
    """Long-form ``(case_id, sweep_idx, gt_ac_mm)`` from the wide GT table.

    Each ``*_ac_mm`` column is one sweep; the sweep index is the first
    integer in the column name; rows without a measurement are dropped.
    """
    key = "case_id" if "case_id" in df.columns else "uuid"
    parts = []
    for col in df.columns:
        m = _AC_COLUMN.search(col)
        if m is None:
            continue
        have = df[col].notna()
        parts.append(pd.DataFrame({
            "case_id": df.loc[have, key].to_numpy(),
            "sweep_idx": int(m.group(1)),
            "gt_ac_mm": df.loc[have, col].to_numpy(dtype=float),
        }))
    if not parts:
        raise ValueError("GT table has no *_ac_mm sweep columns")
    return pd.concat(parts, ignore_index=True)


def read_pred(path, model: str, fps: int) -> pd.DataFrame:
    """Load one model's ``ac_results.csv`` and tag it with model + sweep."""
    df = pd.read_csv(path)
    missing = [c for c in _PRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"{path} needs columns {set(_PRED_COLUMNS)}")
    out = df.loc[:, list(_PRED_COLUMNS)].copy()
    out["sweep_idx"] = frame_to_sweep(out["frame_idx"].to_numpy(), fps)
    out["model"] = model
    return out


def match_predictions(gt_long: pd.DataFrame,
                      preds: Sequence[pd.DataFrame]) -> pd.DataFrame:
    """Inner-join predictions with GT on (case_id, sweep_idx) and attach
    per-row error columns."""
    joined = pd.concat(list(preds), ignore_index=True).merge(
        gt_long, on=["case_id", "sweep_idx"], how="inner")
    if joined.empty:
        raise RuntimeError("No matched (case_id, sweep_idx)")
    err = joined["ac_mm"].to_numpy(float) - joined["gt_ac_mm"].to_numpy(float)
    # reference merged-CSV error columns kept verbatim (abs_err/sq_err/ape_%,
    # ``analyze_ac.py:59-61``); err_mm (signed) is an addition
    return joined.assign(err_mm=err, abs_err=np.abs(err),
                         sq_err=err ** 2,
                         **{"ape_%": 100.0 * np.abs(err)
                            / joined["gt_ac_mm"]})


# ------------------------------------------------------------------ metrics

# (column name, scorer over (pred_mm, gt_mm) arrays)
ERROR_METRICS: Tuple[Tuple[str, Callable], ...] = (
    ("MAE_mm",   lambda p, g: np.mean(np.abs(p - g))),
    ("RMSE_mm",  lambda p, g: np.sqrt(np.mean((p - g) ** 2))),
    ("MAPE_pct", lambda p, g: 100.0 * np.mean(np.abs(p - g) / g)),
    ("Corr_r",   lambda p, g: np.corrcoef(p, g)[0, 1]),
)


def error_table(matched: pd.DataFrame, ndigits: int = 3) -> pd.DataFrame:
    """One row per model, one column per ``ERROR_METRICS`` entry."""
    rows: Dict[str, Dict[str, float]] = {}
    # sorted groupby → alphabetical model rows, the reference's metrics.csv
    # row order (``analyze_ac.py:101-107`` uses the groupby default)
    for model, sub in matched.groupby("model", sort=True):
        p = sub["ac_mm"].to_numpy(float)
        g = sub["gt_ac_mm"].to_numpy(float)
        rows[model] = {name: round(float(fn(p, g)), ndigits)
                       for name, fn in ERROR_METRICS}
    return pd.DataFrame.from_dict(rows, orient="index").rename_axis("model")


def paired_tests(err_a, err_b) -> Dict[str, float]:
    """Paired t-test + Wilcoxon signed-rank over matched absolute errors.

    Empty when the two error vectors cannot be paired (different lengths —
    the models were evaluated on different case sets) or are too short.
    """
    a = np.asarray(err_a, dtype=float)
    b = np.asarray(err_b, dtype=float)
    if a.shape != b.shape or a.size < 2:
        return {}
    t, p_t = ss.ttest_rel(a, b)
    w, p_w = ss.wilcoxon(a, b, zero_method="zsplit")
    return {"t": float(t), "p_t": float(p_t), "w": float(w), "p_w": float(p_w)}


# ------------------------------------------------------------------- plots

def _identity_scatter(ax, gt: np.ndarray, pred: np.ndarray) -> None:
    """Predicted vs GT with the y=x perfect-agreement line."""
    ax.scatter(gt, pred, alpha=0.6)
    span = (min(gt.min(), pred.min()), max(gt.max(), pred.max()))
    ax.plot(span, span, ls="--")
    ax.set_xlabel("GT (mm)")
    ax.set_ylabel("Pred (mm)")


def _bland_altman(ax, gt: np.ndarray, pred: np.ndarray) -> None:
    """Difference vs mean with bias and 95% limits of agreement."""
    diff = pred - gt
    bias = diff.mean()
    loa = 1.96 * diff.std(ddof=1)
    ax.scatter((gt + pred) / 2.0, diff, alpha=0.6)
    ax.axhline(bias, ls="--")
    for limit in (bias - loa, bias + loa):
        ax.axhline(limit, ls="--", c="r")
    ax.set_xlabel("Mean (mm)")
    ax.set_ylabel("Diff (mm)")


# (output filename template, axes renderer) — one pair of files per model
PER_MODEL_FIGURES = (("scatter_{model}.png", _identity_scatter),
                     ("bland_alt_{model}.png", _bland_altman))


def save_agreement_plots(matched: pd.DataFrame, out: Path,
                         models: Sequence[str]) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for model in models:
        sub = matched[matched["model"] == model]
        if sub.empty:
            continue
        gt = sub["gt_ac_mm"].to_numpy(float)
        pred = sub["ac_mm"].to_numpy(float)
        for template, render in PER_MODEL_FIGURES:
            fig, ax = plt.subplots(figsize=(5, 5))
            render(ax, gt, pred)
            ax.set_title(model)
            fig.savefig(out / template.format(model=model), dpi=300)
            plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    for model in models:
        ax.hist(matched.loc[matched["model"] == model, "abs_err"],
                bins=25, alpha=0.5, label=model, histtype="stepfilled")
    ax.legend()
    fig.savefig(out / "error_hist.png", dpi=300)
    plt.close(fig)


# ------------------------------------------------------------------ driver

def analyze_ac(gt_csv, baseline_csv, new_csv, out_dir,
               frames_per_sweep: int = 140,
               model_names=("baseline", "attention_aspp_unet"),
               make_plots: bool = True, log=print) -> Dict:
    """Full AC agreement analysis between two models and the GT table."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    gt_long = melt_gt(pd.read_csv(gt_csv))
    matched = match_predictions(gt_long, [
        read_pred(path, name, frames_per_sweep)
        for path, name in zip((baseline_csv, new_csv), model_names)])
    matched.to_csv(out / "merged_ac_values.csv", index=False)

    metrics = error_table(matched)
    metrics.to_csv(out / "metrics.csv", index=True)
    log("\n*** Metrics ***\n" + str(metrics))

    per_model_err = {name: matched.loc[matched["model"] == name, "abs_err"]
                     .to_numpy(float) for name in model_names}
    tests = paired_tests(per_model_err[model_names[0]],
                         per_model_err[model_names[1]])
    if tests:
        (out / "stats.txt").write_text(
            "Paired t-test: t={t:.3f}, p={p_t:.4g}\n"
            "Wilcoxon: W={w:.1f}, p={p_w:.4g}\n".format(**tests))

    if make_plots:
        save_agreement_plots(matched, out, model_names)
    return {"metrics": metrics, "stats": tests, "merged": matched}
