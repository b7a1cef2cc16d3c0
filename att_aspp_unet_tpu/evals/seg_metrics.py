"""Segmentation evaluation: GT vs baseline vs new model.

Metrics and statistics of ``/root/reference/eval_segmentation_batch.py``:
Dice, IoU, HD95 (erosion boundary + EDT 95th percentile), per-metric
mean/std/median/min/max, improve ratio, Wilcoxon signed-rank with star
notation, top/worst-5 listing, ``seg_eval.csv``, optional hist/box plots.
Case matching is by leading 36-char UUID, recursive over each directory.
"""

from __future__ import annotations

import csv
import re
import statistics as st
from math import isnan
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy import ndimage as ndi
from scipy import stats as ss

from ..io import read_gray_png

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}
ID_RE = re.compile(r"^([0-9a-f-]{36})", re.I)


def case_id(stem: str) -> str:
    m = ID_RE.match(stem)
    if not m:
        raise ValueError(f"no 36-char UUID prefix in {stem!r}")
    return m.group(1).lower()


def _bin(a: np.ndarray) -> np.ndarray:
    return (np.asarray(a) > 0).astype(np.uint8)


def dice(a, b, eps: float = 1e-7) -> float:
    a, b = _bin(a), _bin(b)
    inter = int((a & b).sum())
    return float((2 * inter + eps) / (a.sum() + b.sum() + eps))


def iou(a, b, eps: float = 1e-7) -> float:
    a, b = _bin(a), _bin(b)
    inter = int((a & b).sum())
    return float((inter + eps) / (a.sum() + b.sum() - inter + eps))


_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)


def hd95(a, b) -> float:
    """95th-percentile symmetric boundary distance in pixels (NaN when either
    mask is empty).  Boundary = mask − cross-erosion (border kept, matching
    cv2.erode's +inf constant border); distances via EDT."""
    a, b = _bin(a).astype(bool), _bin(b).astype(bool)
    if a.sum() == 0 or b.sum() == 0:
        return float("nan")
    ab = a & ~ndi.binary_erosion(a, structure=_CROSS, border_value=1)
    bb = b & ~ndi.binary_erosion(b, structure=_CROSS, border_value=1)
    dta = ndi.distance_transform_edt(~ab)
    dtb = ndi.distance_transform_edt(~bb)
    d1 = dtb[ab]
    d2 = dta[bb]
    return float(max(np.percentile(d1, 95), np.percentile(d2, 95)))


def index_dir(root: Path, suffix_strip: str = "") -> Dict[str, Path]:
    idx: Dict[str, Path] = {}
    root = Path(root)
    if not root.exists():
        return idx
    for p in sorted(root.rglob("*")):
        if p.suffix.lower() in IMG_EXTS:
            idx[case_id(p.stem.replace(suffix_strip, ""))] = p
    return idx


def describe(arr) -> Tuple[float, float, float, float, float]:
    vals = [x for x in arr if not isnan(x)]
    sd = st.stdev(vals) if len(vals) > 1 else 0.0
    return st.mean(vals), sd, st.median(vals), min(vals), max(vals)


def show_metric(name: str, new_arr, base_arr, unit: str = "",
                higher_is_better: bool = True, log=print) -> dict:
    mn, sn, mdn, minn, maxn = describe(new_arr)
    mb, sb, mdb, minb, maxb = describe(base_arr)
    cmp_arr = (np.array(new_arr) > np.array(base_arr)) if higher_is_better \
        else (np.array(new_arr) < np.array(base_arr))
    improve_count = int(cmp_arr.sum())
    improve_ratio = 100.0 * improve_count / len(new_arr)

    _, p = ss.wilcoxon(new_arr, base_arr, alternative="two-sided")
    stars = "n.s."
    if p < 0.001:
        stars = "***"
    elif p < 0.01:
        stars = "**"
    elif p < 0.05:
        stars = "*"

    log(f"\n{name} {unit}")
    log(f"  New  : {mn:.4f} ± {sn:.4f} | median {mdn:.4f} | "
        f"min {minn:.4f} | max {maxn:.4f}")
    log(f"  Base : {mb:.4f} ± {sb:.4f} | median {mdb:.4f} | "
        f"min {minb:.4f} | max {maxb:.4f}")
    log(f"  Improve ratio: {improve_ratio:.1f}% ({improve_count}/{len(new_arr)})")
    log(f"  Wilcoxon p={p:.4g}  {stars}")
    return {"new_mean": mn, "base_mean": mb, "improve_ratio": improve_ratio,
            "wilcoxon_p": float(p), "stars": stars}


def evaluate_directories(gt_dir: Path, base_dir: Path, new_dir: Path,
                         out_csv: Optional[Path] = None,
                         new_suffix: str = "_mask", plot_dir: Optional[Path] = None,
                         log=print) -> List[tuple]:
    """Per-case Dice/IoU/HD95 for new + baseline vs GT → rows + seg_eval.csv."""
    gt_idx = index_dir(gt_dir)
    base_idx = index_dir(base_dir)
    new_idx = index_dir(new_dir, suffix_strip=new_suffix)

    rows = []
    for cid, gp in gt_idx.items():
        if cid not in base_idx or cid not in new_idx:
            log(f"{cid}: missing prediction, skipped")
            continue
        gt = read_gray_png(gp)
        pb = read_gray_png(base_idx[cid])
        pn = read_gray_png(new_idx[cid])
        d_n, i_n, h_n = dice(pn, gt), iou(pn, gt), hd95(pn, gt)
        d_b, i_b, h_b = dice(pb, gt), iou(pb, gt), hd95(pb, gt)
        rows.append((cid, d_n, i_n, h_n, d_b, i_b, h_b,
                     d_n - d_b, i_n - i_b, h_n - h_b))
    if not rows:
        raise SystemExit("No matching cases between GT/base/new directories")

    dice_n = [r[1] for r in rows]
    dice_b = [r[4] for r in rows]
    show_metric("Dice", dice_n, dice_b, higher_is_better=True, log=log)
    show_metric("IoU ", [r[2] for r in rows], [r[5] for r in rows],
                higher_is_better=True, log=log)
    show_metric("HD95", [r[3] for r in rows], [r[6] for r in rows], "px",
                higher_is_better=False, log=log)

    ranked = sorted(rows, key=lambda r: r[1], reverse=True)
    log("\nTop-5 Dice(New):")
    for r in ranked[:5]:
        log(f"  {r[0][:8]}… New {r[1]:.4f} | Base {r[4]:.4f}")
    log("Worst-5 Dice(New):")
    for r in ranked[-5:]:
        log(f"  {r[0][:8]}… New {r[1]:.4f} | Base {r[4]:.4f}")

    if out_csv:
        out_csv = Path(out_csv)
        out_csv.parent.mkdir(parents=True, exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["case", "dice_new", "iou_new", "hd95_new_px",
                        "dice_base", "iou_base", "hd95_base_px",
                        "dice_diff", "iou_diff", "hd95_diff"])
            w.writerows(rows)
        log(f"\nwrote {out_csv}")

    if plot_dir:
        _plots(rows, Path(plot_dir), log)
    return rows


def _plots(rows, plot_dir: Path, log=print) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plot_dir.mkdir(parents=True, exist_ok=True)
    series = [("dice", [r[1] for r in rows], [r[4] for r in rows]),
              ("iou", [r[2] for r in rows], [r[5] for r in rows]),
              ("hd95", [r[3] for r in rows], [r[6] for r in rows])]
    for name, new, base in series:
        new = [v for v in new if not isnan(v)]
        base = [v for v in base if not isnan(v)]
        plt.figure()
        plt.hist([base, new], label=["Base", "New"], bins=20, alpha=0.6)
        plt.legend()
        plt.title(f"{name.upper()} distribution")
        plt.xlabel(name.upper())
        plt.savefig(plot_dir / f"{name}_hist.png", dpi=200)
        plt.close()

        plt.figure()
        plt.boxplot([base, new], tick_labels=["Base", "New"])
        plt.title(f"{name.upper()} boxplot")
        plt.ylabel(name.upper())
        plt.savefig(plot_dir / f"{name}_box.png", dpi=200)
        plt.close()
    log(f"plots saved to {plot_dir}")
