"""Dataset builder: slice 3-D .mha volumes into per-frame PNG image/mask
pairs with negative-frame sampling.

Capabilities of ``/root/reference/convert_to_png.py`` (which, note, does not
parse as shipped — ``required=True")`` syntax errors at :182-183): percentile
(1, 99) normalisation, top-K largest-mask positive frames (+optional
neighbour padding), negative sampling (all / random / stride, ratio+cap,
global cap), mm²-or-px area threshold, ``frame_indices.json`` (+ spacing
meta) and ``mapping.csv``.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from ..io import read_mha, write_gray_png


def normalize_slice_to_u8(sl: np.ndarray) -> np.ndarray:
    """Percentile(1, 99)-windowed rescale to uint8 (robust to speckle)."""
    sl = sl.astype(np.float32)
    p1, p99 = np.percentile(sl, (1, 99))
    if p99 - p1 < 1e-5:
        return np.zeros_like(sl, np.uint8)
    sl = np.clip(sl, p1, p99)
    sl = (sl - p1) / (p99 - p1 + 1e-5)
    return (sl * 255).round().astype(np.uint8)


def decide_threshold_px(min_area_mm2: Optional[float], min_area_px: int,
                        sx_sy_mm: Optional[Tuple[float, float]]) -> int:
    thr_px = int(max(1, min_area_px))
    if min_area_mm2 and sx_sy_mm:
        sx, sy = sx_sy_mm
        thr_px = max(thr_px, int(np.ceil(min_area_mm2 / (sx * sy))))
    return thr_px


def _xy_spacing(img) -> Optional[Tuple[float, float]]:
    try:
        sx, sy = float(img.spacing[0]), float(img.spacing[1])
        return (sx, sy) if sx > 0 and sy > 0 else None
    except Exception:
        return None


def convert_frames_with_negatives(
        mha_root, out_root, topk: int = 3, neighbor_pad: int = 0,
        min_area_mm2: Optional[float] = 80.0, min_area_px: int = 100,
        neg_strategy: str = "random", neg_ratio: float = 0.0,
        neg_cap: int = 5, neg_stride: int = 5, seed: int = 2025,
        export_neg_only: bool = False, neg_total_cap: int = 0,
        log=print) -> Dict:
    assert neg_strategy in ("all", "random", "stride")
    rng = np.random.default_rng(seed)

    mha_root = Path(mha_root)
    out_img = Path(out_root, "images")
    out_msk = Path(out_root, "masks")
    out_img.mkdir(parents=True, exist_ok=True)
    out_msk.mkdir(parents=True, exist_ok=True)

    image_files = list((mha_root / "images").glob("*.mha"))
    image_files = list(rng.permutation(image_files))

    index_dict: Dict[str, dict] = {}
    neg_total_saved = 0

    for f_img in image_files:
        name = Path(f_img).stem
        f_msk = mha_root / "masks" / f"{name}.mha"
        if not f_msk.exists():
            log(f"{name}: no mask, skipped")
            continue

        img = read_mha(f_img)
        msk = read_mha(f_msk)
        img3d, msk3d = img.array, msk.array
        Z = img3d.shape[0]

        sx_sy = _xy_spacing(img) or _xy_spacing(msk) or (1.0, 1.0)
        thr_px = decide_threshold_px(min_area_mm2, min_area_px, sx_sy)

        areas_px = (msk3d > 0).reshape(Z, -1).sum(1)
        is_pos = areas_px >= thr_px
        pos_pool = np.where(is_pos)[0]
        neg_pool = np.where(~is_pos)[0]

        pos_idxs = np.array([], dtype=int)
        if not export_neg_only and pos_pool.size and topk > 0:
            order = np.argsort(areas_px[pos_pool])[::-1]
            top = pos_pool[order[: min(topk, len(pos_pool))]]
            if neighbor_pad > 0:
                extra = [j for i in top
                         for j in range(i - neighbor_pad, i + neighbor_pad + 1)
                         if 0 <= j < Z]
                pos_idxs = np.unique(np.concatenate([top, np.array(extra, int)]))
                pos_idxs = pos_idxs[is_pos[pos_idxs]]
            else:
                pos_idxs = np.unique(top)

        neg_idxs = np.array([], dtype=int)
        if neg_pool.size:
            if neg_strategy == "all":
                neg_idxs = neg_pool
            elif neg_strategy == "random":
                n_neg = (len(neg_pool) if export_neg_only or not pos_idxs.size
                         else int(min(np.ceil(neg_ratio * len(pos_idxs)),
                                      neg_cap)))
                if n_neg > 0:
                    neg_idxs = rng.choice(neg_pool, min(n_neg, len(neg_pool)),
                                          replace=False)
            elif neg_strategy == "stride":
                neg_idxs = neg_pool[:: max(1, neg_stride)][:neg_cap]

        if neg_total_cap > 0:
            remain = neg_total_cap - neg_total_saved
            if remain <= 0:
                neg_idxs = np.array([], dtype=int)
            elif len(neg_idxs) > remain:
                neg_idxs = rng.choice(neg_idxs, remain, replace=False)

        saved_pos, saved_neg, saved_frames = [], [], []
        for idx in pos_idxs:
            sl_u8 = normalize_slice_to_u8(img3d[idx])
            msk_u8 = ((msk3d[idx] > 0) * 255).astype(np.uint8)
            fname = f"{name}_s{int(idx):03d}.png"
            write_gray_png(out_img / fname, sl_u8)
            write_gray_png(out_msk / fname, msk_u8)
            saved_pos.append(int(idx))
            saved_frames.append({"idx": int(idx), "cls": "pos",
                                 "img": f"images/{fname}",
                                 "mask": f"masks/{fname}"})
        for idx in neg_idxs:
            sl_u8 = normalize_slice_to_u8(img3d[idx])
            fname = f"{name}_s{int(idx):03d}.png"
            write_gray_png(out_img / fname, sl_u8)
            write_gray_png(out_msk / fname, np.zeros_like(sl_u8))
            saved_neg.append(int(idx))
            saved_frames.append({"idx": int(idx), "cls": "neg",
                                 "img": f"images/{fname}",
                                 "mask": f"masks/{fname}"})
        neg_total_saved += len(saved_neg)

        if saved_pos or saved_neg:
            index_dict[name] = {
                "pos": sorted(saved_pos),
                "neg": sorted(saved_neg),
                "frames": saved_frames,
                "_meta": {
                    "thr_px": int(thr_px),
                    "spacing_xy_mm": [float(sx_sy[0]), float(sx_sy[1])],
                    "min_area_mm2": None if min_area_mm2 is None
                    else float(min_area_mm2),
                },
            }

    (out_msk / "frame_indices.json").write_text(
        json.dumps(index_dict, indent=2, ensure_ascii=False))
    with open(Path(out_root) / "mapping.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["case_id", "frame_idx"])
        for case_id, info in sorted(index_dict.items()):
            for fr in info.get("frames", []):
                w.writerow([case_id, fr["idx"]])
    return index_dict
