"""Ablation-study visual outputs.

Equivalents of the ablation runner's figures (``test_ablation.py``):

- ``save_attention_panel`` (``:454-479``): a 2×4 sheet per case — raw frame,
  attention-model probability overlay, ψ-map overlay, mask overlay on row 1;
  the no-attention model's counterparts on row 2.
- ``save_topk_candidates`` (``:493-513``): the top-K area candidate frames
  with probability and mask overlays, the circularity/area per candidate, and
  the selected frame highlighted.
- ``write_slice_metrics_csv`` (``:874-876``): per-slice area + circularity
  table for a predicted sweep.

Matplotlib/PIL only (the reference used OpenCV colormaps).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def _colorize(prob: np.ndarray) -> np.ndarray:
    """Jet-like colourisation of a [0,1] map → uint8 RGB."""
    import matplotlib

    p = np.clip(np.nan_to_num(np.squeeze(prob), nan=0.0), 0.0, 1.0)
    cmap = matplotlib.colormaps["jet"]
    return (cmap(p)[..., :3] * 255).astype(np.uint8)


def _overlay(gray: np.ndarray, color_rgb: np.ndarray,
             alpha: float = 0.5) -> np.ndarray:
    base = np.stack([gray] * 3, axis=-1).astype(np.float32)
    return ((1 - alpha) * base + alpha * color_rgb.astype(np.float32)
            ).astype(np.uint8)


def save_attention_panel(case_id: str, raw_u8: np.ndarray,
                         prob_att: np.ndarray, psi_att: np.ndarray,
                         mask_att: np.ndarray, prob_noatt: np.ndarray,
                         mask_noatt: np.ndarray, out_dir) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    raw_rgb = np.stack([raw_u8] * 3, axis=-1)

    def mask_rgb(m):
        return np.stack([(m > 0) * 255] * 3, axis=-1).astype(np.uint8)

    row1 = np.hstack([
        raw_rgb,
        _overlay(raw_u8, _colorize(prob_att)),
        _overlay(raw_u8, _colorize(_resize_like(psi_att, raw_u8))),
        _overlay(raw_u8, mask_rgb(mask_att), 0.4),
    ])
    blank = np.full_like(raw_rgb, 255)
    row2 = np.hstack([
        raw_rgb,
        _overlay(raw_u8, _colorize(prob_noatt)),
        blank,
        _overlay(raw_u8, mask_rgb(mask_noatt), 0.4),
    ])
    panel = np.vstack([row1, row2])

    from PIL import Image

    out = out_dir / f"{case_id}_panel.png"
    Image.fromarray(panel).save(out)
    return out


def _resize_like(m: np.ndarray, ref: np.ndarray) -> np.ndarray:
    m = np.squeeze(np.asarray(m, np.float32))
    if m.shape == ref.shape:
        return m
    from PIL import Image

    return np.asarray(Image.fromarray(m).resize(
        (ref.shape[1], ref.shape[0]), Image.BILINEAR))


def save_topk_candidates(imgs_u8: np.ndarray, probs: np.ndarray,
                         masks: np.ndarray, topk_idx: Sequence[int],
                         best_idx: int, ac_mm: float, out_png) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..postprocess import circularity

    K = len(topk_idx)
    fig, axes = plt.subplots(2, K, figsize=(3.2 * K, 6), dpi=180,
                             squeeze=False)
    for j, idx in enumerate(topk_idx):
        img = imgs_u8[idx]
        m = masks[idx].astype(bool)
        circ = float(circularity(masks[idx][None])[0])
        ax = axes[0, j]
        ax.imshow(img, cmap="gray")
        ax.imshow(probs[idx], cmap="jet", alpha=0.35, vmin=0, vmax=1)
        ax.set_title(f"s{idx}  circ={circ:.2f}\narea={int(m.sum())}")
        ax.axis("off")
        ax = axes[1, j]
        ax.imshow(img, cmap="gray")
        ax.imshow(m, cmap="spring", alpha=0.35)
        ax.axis("off")
        if idx == best_idx:
            for a in (axes[0, j], axes[1, j]):
                for sp in a.spines.values():
                    sp.set_edgecolor("lime")
                    sp.set_linewidth(3)
    fig.suptitle(f"Top-{K} candidates; best = s{best_idx}; "
                 f"AC = {ac_mm:.1f} mm", y=0.98)
    plt.tight_layout()
    fig.savefig(out_png, bbox_inches="tight")
    plt.close(fig)


def write_slice_metrics_csv(masks: np.ndarray, out_csv, case_id: str = ""
                            ) -> None:
    """Per-slice area (px) and circularity of a (N, H, W) mask stack."""
    from ..postprocess import circularity

    circs = np.asarray(circularity(masks))
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["case_id", "slice_idx", "area_px", "circularity"])
        for i, m in enumerate(masks):
            w.writerow([case_id, i, int((m > 0).sum()), f"{circs[i]:.6f}"])
