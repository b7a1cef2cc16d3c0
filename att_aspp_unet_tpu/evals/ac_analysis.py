"""Sweep-aware abdominal-circumference analysis.

``/root/reference/analyze_ac.py`` semantics: melt the wide GT CSV (six
``sweep_i_ac_mm`` columns) to long form, map prediction ``frame_idx`` to a
1-based ``sweep_idx`` via ``frame_idx // frames_per_sweep + 1``, merge on
(case_id, sweep_idx), report MAE/RMSE/MAPE/Pearson-r per model plus a paired
t-test and Wilcoxon between models, and emit scatter / Bland-Altman / error
histogram plots.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np
import pandas as pd
from scipy import stats


def melt_gt(df: pd.DataFrame) -> pd.DataFrame:
    sweep_cols = [c for c in df.columns if c.endswith("_ac_mm")]
    long = (df.melt(id_vars=[c for c in df.columns if c not in sweep_cols],
                    value_vars=sweep_cols,
                    var_name="sweep", value_name="gt_ac_mm")
            .dropna(subset=["gt_ac_mm"]).copy())
    if "uuid" in long.columns and "case_id" not in long.columns:
        long["case_id"] = long["uuid"]
    long["sweep_idx"] = long["sweep"].str.extract(r"(\d+)").astype("Int64")
    return long[["case_id", "sweep_idx", "gt_ac_mm"]]


def read_pred(path, model: str, fps: int) -> pd.DataFrame:
    df = pd.read_csv(path)
    req = {"case_id", "frame_idx", "ac_mm"}
    if not req.issubset(df.columns):
        raise ValueError(f"{path} needs columns {req}")
    df["model"] = model
    df["sweep_idx"] = (df["frame_idx"] // fps).astype(int) + 1
    return df[["case_id", "sweep_idx", "frame_idx", "ac_mm", "model"]]


def add_err(d: pd.DataFrame) -> pd.DataFrame:
    d["abs_err"] = (d["ac_mm"] - d["gt_ac_mm"]).abs()
    d["sq_err"] = (d["ac_mm"] - d["gt_ac_mm"]) ** 2
    d["ape_%"] = d["abs_err"] / d["gt_ac_mm"] * 100
    return d


def analyze_ac(gt_csv, baseline_csv, new_csv, out_dir,
               frames_per_sweep: int = 140,
               model_names=("baseline", "attention_aspp_unet"),
               make_plots: bool = True, log=print) -> Dict:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    gt = melt_gt(pd.read_csv(gt_csv))
    pred = pd.concat([read_pred(baseline_csv, model_names[0], frames_per_sweep),
                      read_pred(new_csv, model_names[1], frames_per_sweep)])
    data = pred.merge(gt, on=["case_id", "sweep_idx"], how="inner")
    if data.empty:
        raise RuntimeError("No matched (case_id, sweep_idx)")
    data = add_err(data)
    data.to_csv(out / "merged_ac_values.csv", index=False)

    metrics = (data.groupby("model")
               .agg(MAE_mm=("abs_err", "mean"),
                    RMSE_mm=("sq_err", lambda x: np.sqrt(x.mean())),
                    MAPE_pct=("ape_%", "mean"),
                    Corr_r=("ac_mm", lambda x: x.corr(
                        data.loc[x.index, "gt_ac_mm"])))
               .round(3))
    metrics.to_csv(out / "metrics.csv", index=True)
    log("\n*** Metrics ***\n" + str(metrics))

    be = data.query("model == @model_names[0]")["abs_err"]
    ne = data.query("model == @model_names[1]")["abs_err"]
    stats_txt = {}
    if len(be) == len(ne) and len(be) > 1:
        t, p_t = stats.ttest_rel(be, ne)
        w, p_w = stats.wilcoxon(be, ne, zero_method="zsplit")
        stats_txt = {"t": float(t), "p_t": float(p_t),
                     "w": float(w), "p_w": float(p_w)}
        (out / "stats.txt").write_text(
            f"Paired t-test: t={t:.3f}, p={p_t:.4g}\n"
            f"Wilcoxon: W={w:.1f}, p={p_w:.4g}\n")

    if make_plots:
        _plots(data, out, model_names)
    return {"metrics": metrics, "stats": stats_txt, "merged": data}


def _scatter(ax, gt, pred, title):
    ax.scatter(gt, pred, alpha=0.6)
    lim = [min(gt.min(), pred.min()), max(gt.max(), pred.max())]
    ax.plot(lim, lim, ls="--")
    ax.set_xlabel("GT (mm)")
    ax.set_ylabel("Pred (mm)")
    ax.set_title(title)


def _bland_alt(ax, gt, pred, title):
    diff = pred - gt
    md, sd = diff.mean(), diff.std(ddof=1)
    loa = 1.96 * sd
    ax.scatter((gt + pred) / 2, diff, alpha=0.6)
    ax.axhline(md, ls="--")
    ax.axhline(md - loa, ls="--", c="r")
    ax.axhline(md + loa, ls="--", c="r")
    ax.set_xlabel("Mean (mm)")
    ax.set_ylabel("Diff (mm)")
    ax.set_title(title)


def _plots(data: pd.DataFrame, out: Path, model_names) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for m in model_names:
        sub = data.query("model == @m")
        if sub.empty:
            continue
        fig, ax = plt.subplots(figsize=(5, 5))
        _scatter(ax, sub["gt_ac_mm"], sub["ac_mm"], m)
        fig.savefig(out / f"scatter_{m}.png", dpi=300)
        plt.close(fig)
        fig, ax = plt.subplots(figsize=(5, 5))
        _bland_alt(ax, sub["gt_ac_mm"], sub["ac_mm"], m)
        fig.savefig(out / f"bland_alt_{m}.png", dpi=300)
        plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    for m in model_names:
        ax.hist(data.query("model == @m")["abs_err"], bins=25, alpha=0.5,
                label=m, histtype="stepfilled")
    ax.legend()
    fig.savefig(out / "error_hist.png", dpi=300)
    plt.close(fig)
