"""Dataset reports + seg-eval summary plots (the reference ``plot/`` suite).

Covers SURVEY.md §2 #22:

(a) dataset reports — three input modes like ``plot/make_dataset_reports.py``
    (frame_indices.json / pos-neg subdirs / flat images+masks), producing
    ``split_stats.csv``, ``per_case_stats.csv``, class-balance + frames-per-
    case plots and a LaTeX table (English caption; the reference hard-coded
    absolute user paths — this takes arguments);
(b) attention-vs-no-attention paired comparison plots
    (``plot/plot_attention_comparison.py``);
(c) seg_eval summary stats + plots (``plot/plot_from_seg_eval.py`` —
    reimplemented WITHOUT the reference's swapped new/base column bug, see
    SURVEY.md §7 quirks);
(d) Dice scatter / ΔDice histogram (``plot/dice_plot.py``) lives in
    ``visualize.plot_dice_summary``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from ..io import read_gray_png

_CASE_RX = re.compile(r"^([A-Za-z0-9\-]+)[_\-]?\d+")


def _case_of(stem: str, rx=None) -> str:
    m = (rx or _CASE_RX).match(stem)
    return m.group(1) if m else stem.split("_")[0]


def load_from_frame_index(json_path: Path) -> pd.DataFrame:
    data = json.loads(Path(json_path).read_text())
    rows = []
    if isinstance(data, list):
        for it in data:
            split = str(it.get("split", it.get("subset", "train"))).lower()
            label = str(it.get("label", it.get("cls", "pos"))).lower()
            case = it.get("case") or it.get("case_id") or it.get("study_id")
            fname = it.get("path") or it.get("file") or it.get("filename")
            label = "pos" if label in ("1", "true", "pos", "positive",
                                       "foreground") else "neg"
            if case is None and fname:
                case = Path(fname).stem.split("_")[0]
            rows.append({"split": split, "cls": label, "case": case,
                         "file": fname})
    elif isinstance(data, dict):
        guess = "train" if "train" in str(Path(json_path).parent).lower() \
            else ("val" if "val" in str(Path(json_path).parent).lower()
                  else "train")
        for case, d in data.items():
            for idx in d.get("pos", []):
                rows.append({"split": guess, "cls": "pos", "case": case,
                             "file": f"{case}_s{idx:03d}.png"})
            for idx in d.get("neg", []):
                rows.append({"split": guess, "cls": "neg", "case": case,
                             "file": f"{case}_s{idx:03d}.png"})
    else:
        raise ValueError("Unsupported frame_indices.json structure")
    return pd.DataFrame(rows)


def load_from_directory(root: Path, splits=("train", "val"),
                        classes=("pos", "neg"),
                        case_regex: Optional[str] = None) -> pd.DataFrame:
    rx = re.compile(case_regex) if case_regex else _CASE_RX
    recs = []
    for sp in splits:
        for cl in classes:
            d = Path(root) / sp / cl
            if not d.exists():
                continue
            for p in sorted(d.glob("*.png")):
                recs.append({"split": sp, "cls": cl,
                             "case": _case_of(p.stem, rx), "file": str(p)})
    return pd.DataFrame(recs)


def load_flat_images_masks(root: Path, case_regex: Optional[str] = None,
                           split_name_override: Optional[str] = None
                           ) -> pd.DataFrame:
    rx = re.compile(case_regex) if case_regex else _CASE_RX
    root = Path(root)
    if split_name_override:
        splits = [(split_name_override, root)]
    else:
        splits = [(sub.name, sub) for sub in sorted(root.iterdir())
                  if sub.is_dir() and (sub / "images").exists()
                  and (sub / "masks").exists()] if root.exists() else []
        if not splits and (root / "images").exists() and (root / "masks").exists():
            splits = [("train", root)]
    recs = []
    for sp_name, sp_dir in splits:
        img_dir, msk_dir = sp_dir / "images", sp_dir / "masks"
        for p in sorted(img_dir.glob("*.png")):
            mp = msk_dir / p.name
            if not mp.exists():
                continue
            cls = "pos" if (read_gray_png(mp) > 0).any() else "neg"
            recs.append({"split": sp_name, "cls": cls,
                         "case": _case_of(p.stem, rx), "file": str(p)})
    return pd.DataFrame(recs)


def summarize(df: pd.DataFrame):
    per_case = (df.groupby(["split", "case"]).size()
                .reset_index(name="frames_per_case"))
    rows = []
    for sp, g in df.groupby("split"):
        total = len(g)
        pos = int((g["cls"] == "pos").sum())
        fpc = per_case[per_case["split"] == sp]["frames_per_case"]
        rows.append({
            "split": sp, "cases": int(g["case"].nunique()),
            "frames_total": total, "pos_frames": pos,
            "neg_frames": total - pos,
            "pos_%": round(100 * pos / total, 1) if total else 0.0,
            "neg_%": round(100 * (total - pos) / total, 1) if total else 0.0,
            "frames_per_case_mean": round(float(fpc.mean()) if len(fpc) else 0.0, 1),
            "frames_per_case_std": round(float(fpc.std(ddof=1)) if len(fpc) > 1 else 0.0, 1),
        })
    total = len(df)
    pos = int((df["cls"] == "pos").sum())
    f_all = per_case["frames_per_case"]
    overall = {"split": "overall", "cases": int(df["case"].nunique()),
               "frames_total": total, "pos_frames": pos,
               "neg_frames": total - pos}
    if total:
        overall["pos_%"] = round(100 * pos / total, 1)
        overall["neg_%"] = round(100 * (total - pos) / total, 1)
    overall["frames_per_case_mean"] = round(float(f_all.mean()) if len(f_all) else 0.0, 1)
    overall["frames_per_case_std"] = round(float(f_all.std(ddof=1)) if len(f_all) > 1 else 0.0, 1)
    return per_case, pd.DataFrame(rows + [overall])


def save_latex_table(summary: pd.DataFrame, tex_path: Path) -> None:
    cols = ["split", "cases", "frames_total", "pos_frames", "neg_frames",
            "pos_%", "neg_%", "frames_per_case_mean", "frames_per_case_std"]
    lines = [r"\begin{table}[t]", r"\centering",
             r"\caption{Dataset split statistics}",
             r"\begin{tabular}{l r r r r r r r r}", r"\toprule",
             r"Split & \#Cases & \#Frames & Pos & Neg & Pos (\%) & Neg (\%) & "
             r"Frames/Case mean & std \\", r"\midrule"]
    for _, r in summary[cols].iterrows():
        lines.append(
            f"{r['split']} & {int(r['cases'])} & {int(r['frames_total'])} & "
            f"{int(r['pos_frames'])} & {int(r['neg_frames'])} & {r['pos_%']} & "
            f"{r['neg_%']} & {r['frames_per_case_mean']} & "
            f"{r['frames_per_case_std']} \\\\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}"]
    Path(tex_path).write_text("\n".join(lines))


def make_dataset_reports(df: pd.DataFrame, outdir: Path, log=print) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    per_case, summary = summarize(df)
    per_case.to_csv(outdir / "per_case_stats.csv", index=False)
    summary.to_csv(outdir / "split_stats.csv", index=False)
    save_latex_table(summary, outdir / "latex_table_split_stats.tex")

    sub = summary[summary["split"].isin(["train", "val", "test"])]
    if not sub.empty:
        x = np.arange(len(sub))
        w = 0.35
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.bar(x - w / 2, sub["pos_%"], w, label="Positive (%)")
        ax.bar(x + w / 2, sub["neg_%"], w, label="Negative (%)")
        ax.set_xticks(x)
        ax.set_xticklabels(sub["split"])
        ax.set_ylabel("Percentage of frames")
        ax.set_title("Class balance")
        ax.legend()
        fig.tight_layout()
        fig.savefig(outdir / "class_balance.png", dpi=300)
        plt.close(fig)

    if not per_case.empty:
        fig, ax = plt.subplots(figsize=(5, 4))
        for sp in sorted(per_case["split"].unique()):
            vals = per_case[per_case["split"] == sp]["frames_per_case"].values
            ax.hist(vals, bins=20, alpha=0.5, label=f"{sp} (n={len(vals)})")
        ax.set_xlabel("Frames per case")
        ax.set_ylabel("Count")
        ax.set_title("Frames-per-case distribution")
        ax.legend()
        fig.tight_layout()
        fig.savefig(outdir / "frames_per_case_hist.png", dpi=300)
        plt.close(fig)
    log(f"dataset reports → {outdir}")


def attention_comparison(with_att_csv: Path, no_att_csv: Path, outdir: Path,
                         log=print) -> pd.DataFrame:
    """Paired per-case comparison of two seg_eval.csv runs (w/ vs w/o
    attention) + ΔDice histogram."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    dfw = pd.read_csv(with_att_csv)
    dfn = pd.read_csv(no_att_csv)
    merged = pd.merge(
        dfw[["case", "dice_new", "iou_new", "hd95_new_px"]],
        dfn[["case", "dice_new", "iou_new", "hd95_new_px"]],
        on="case", suffixes=("_with", "_without"))
    for m in ("dice", "iou"):
        merged[f"delta_{m}"] = merged[f"{m}_new_with"] - merged[f"{m}_new_without"]
    merged["delta_hd95"] = merged["hd95_new_px_with"] - merged["hd95_new_px_without"]
    merged.to_csv(outdir / "attention_comparison.csv", index=False)

    x = np.arange(len(merged))
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.scatter(x, merged["dice_new_without"], label="w/o Attention",
               color="orange")
    ax.scatter(x, merged["dice_new_with"], label="w/ Attention", color="blue")
    for i in range(len(merged)):
        ax.plot([x[i], x[i]], [merged["dice_new_without"].iloc[i],
                               merged["dice_new_with"].iloc[i]],
                color="gray", alpha=0.4)
    ax.set_xlabel("Case index")
    ax.set_ylabel("Dice")
    ax.set_title("Paired Dice comparison")
    ax.legend()
    fig.tight_layout()
    fig.savefig(outdir / "dice_paired.png", dpi=300)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.hist(merged["delta_dice"], bins=20, color="skyblue", edgecolor="black")
    ax.set_xlabel("ΔDice (with − without)")
    ax.set_ylabel("Count")
    ax.set_title("ΔDice histogram")
    fig.tight_layout()
    fig.savefig(outdir / "dice_delta_hist.png", dpi=300)
    plt.close(fig)
    log(f"attention comparison → {outdir}")
    return merged


def seg_eval_summary(seg_eval_csv: Path, px2mm: float = 1.0,
                     log=print) -> pd.DataFrame:
    """Overall stats table of a seg_eval.csv (``plot_from_seg_eval.py``, with
    the new/base columns read CORRECTLY — the reference swapped them)."""
    from scipy.stats import wilcoxon

    df = pd.read_csv(seg_eval_csv)
    unit = "mm" if px2mm != 1.0 else "px"

    def summ(new, base, hib):
        new = np.asarray(new, float)
        base = np.asarray(base, float)
        keep = ~(np.isnan(new) | np.isnan(base))
        new, base = new[keep], base[keep]
        if len(new) == 0:
            return dict(n=0)
        improve = (new > base).mean() * 100 if hib else (new < base).mean() * 100
        p = wilcoxon(new, base, alternative="two-sided").pvalue
        return dict(n=len(new), new_mean=new.mean(),
                    new_std=new.std(ddof=1), new_median=np.median(new),
                    base_mean=base.mean(), base_std=base.std(ddof=1),
                    base_median=np.median(base), improve_pct=improve,
                    wilcoxon_p=float(p))

    rows = [
        {"metric": "dice", **summ(df["dice_new"], df["dice_base"], True)},
        {"metric": "iou", **summ(df["iou_new"], df["iou_base"], True)},
        {"metric": f"hd95({unit})",
         **summ(df["hd95_new_px"] * px2mm, df["hd95_base_px"] * px2mm, False)},
    ]
    out = pd.DataFrame(rows)
    stats_path = Path(seg_eval_csv).parent / "seg_stats.csv"
    out.to_csv(stats_path, index=False)
    log(f"seg stats → {stats_path}")
    return out
