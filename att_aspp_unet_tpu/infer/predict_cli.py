"""Standalone prediction over a directory of PNGs / MHA sweeps.

The ``predict`` subcommand of the reference CLI (``…stage.py:399-523``):

- PNG/JPG: enhance → 512² TTA forward → resize back → blur → threshold
  (``thr.json`` else 0.48) → refine → write ``<stem>_mask.png``; AC from a
  ``--spacing_json`` map keyed by case id (stem up to ``_s<frame>``).
- MHA: the same per-frame, then top-5-area frames re-ranked by circularity,
  per-case ``output.mha`` + frame JSON; AC from the volume's header spacing.
- accumulates ``ac_results.csv`` (case_id, frame_idx, ac_mm).

Unlike the reference (one 512² forward per frame, batch 1 — HOT LOOP in
SURVEY.md §3.3), sweeps run as one batched device program.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Config

# a bulk group holds two f32 device copies (native input + enhanced stack);
# past ~6 GB of group buffers XLA spills across the v5e HBM cliff and bulk
# runs far SLOWER than sequential (probe r36: 840-frame cases at S=3
# measured ×0.11) — predict_directory auto-caps group sizes to stay under
# this budget
BULK_HBM_BUDGET_BYTES = 6.0e9
from ..io import read_gray_png, read_json, read_mha, write_gray_png
from .engine import AttAsppEngine
from .outputs import write_output_mha_and_json


def load_threshold(cfg: Config, thr_path: Path = Path("./checkpoints/thr.json"),
                   log=print) -> float:
    """thr.json override with the reference's silent-fallback semantics."""
    if Path(thr_path).exists():
        try:
            thr = float(read_json(thr_path)["best_thr"])
            log(f"use thr {thr:.3f}")
            return thr
        except Exception:
            pass
    return cfg.predict.threshold


def spacing_from_map(spacing_map: Dict, case_id: str
                     ) -> Optional[Tuple[float, float]]:
    """Accepts both ``{'spacing': [sx, sy, ...]}`` and ``[sx, sy, ...]``
    values (``…stage.py:422-433``)."""
    if case_id not in spacing_map:
        return None
    v = spacing_map[case_id]
    if isinstance(v, dict) and "spacing" in v:
        sx, sy = v["spacing"][:2]
    elif isinstance(v, (list, tuple)) and len(v) >= 2:
        sx, sy = v[:2]
    else:
        return None
    return float(sx), float(sy)


def split_case_frame(stem: str) -> Tuple[str, int]:
    """``<case>_s<frame>`` naming → (case, frame); plain stems → (stem, −1)."""
    if "_s" in stem:
        case = stem.split("_s")[0]
        try:
            return case, int(stem.split("_s")[1])
        except Exception:
            return case, -1
    return stem, -1


def predict_directory(cfg: Config, variables: dict, input_dir: Path,
                      out_dir: Path, spacing_json: Optional[Path] = None,
                      threshold: Optional[float] = None,
                      slice_metrics: bool = False, topk_viz: bool = False,
                      viz_att: bool = False,
                      noatt: Optional[Tuple[Config, dict]] = None,
                      bulk_group: int = 0, read_ahead: bool = True,
                      log=print) -> List[Tuple[str, int, float]]:
    """``slice_metrics``/``topk_viz``: per-slice area+circularity CSV and the
    top-K candidate sheet of the ablation predict variant
    (``test_ablation.py:763-880``).

    ``viz_att``: for PNG inputs, write a 2×4 attention panel per image to
    ``<out>/panels`` — raw, probability, mean ψ, refined mask on the top
    row; the same from an optional no-attention model (``noatt`` =
    (config, variables), the reference's ``--weights_noatt``) below
    (``test_ablation.py:832-842``).

    ``bulk_group`` > 1 groups consecutive same-shape ``.mha`` cases into
    ONE device program per group (``engine.predict_bulk`` — ×1.5 serving
    throughput, probe r35); requires cascade mode.  Outputs are
    byte-identical to the per-case path (per-sweep selection is
    unchanged), ordering is preserved, and a shape change or a non-MHA
    input just closes the current group early."""
    engine = AttAsppEngine(cfg, variables)
    if bulk_group > 1 and not getattr(cfg.predict, "cascade", False):
        raise ValueError("--bulk grouping requires cascade serving "
                         "(pass --cascade)")
    noatt_engine = AttAsppEngine(*noatt) if noatt is not None else None
    thr = threshold if threshold is not None else load_threshold(cfg, log=log)

    spacing_map = {}
    if spacing_json:
        try:
            spacing_map = read_json(spacing_json)
            log(f"loaded spacing map ({len(spacing_map)})")
        except Exception as e:
            log(f"cannot load spacing_json: {e}")

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows: List[Tuple[str, int, float]] = []

    # one handle stays in flight across consecutive .mha cases: the next
    # case's (or group's) device work is dispatched before the previous
    # one's host tail (mask pull + exact select + AC + file writes) runs.
    # A single FIFO holds whatever is in flight — mixing single-case and
    # bulk-group handles — so rows/ac_results.csv always come out in
    # submission order (the reference's CSV contract, …stage.py:516-523)
    pending_q: List[tuple] = []   # ("case", stem, img, handle, sp)
    #                             | ("group", metas, handle)

    def _collect_case(stem, img, handle, sp):
        best, best_mask, ac = engine.predict_case_collect(handle, sp)
        ac = round(ac, 1)
        write_output_mha_and_json(out_dir, stem, best_mask, best, img)
        rows.append((stem, int(best), ac))
        log(f"{stem}: best_frame={best}, AC={ac:.1f} mm")

    def _collect_group(metas, handle):
        for (stem, img, sp), (best, best_mask, _) in zip(
                metas, engine.predict_bulk_collect(handle)):
            ac = round(engine.measure(best_mask, sp), 1)
            write_output_mha_and_json(out_dir, stem, best_mask, best, img)
            rows.append((stem, int(best), ac))
            log(f"{stem}: best_frame={best}, AC={ac:.1f} mm")

    def drain(keep: int = 0):
        while len(pending_q) > keep:
            kind, *rest = pending_q.pop(0)
            (_collect_case if kind == "case" else _collect_group)(*rest)

    def submit_case(stem, img, vol, sp):
        handle = engine.predict_case_submit(vol, thr)
        pending_q.append(("case", stem, img, handle, sp))
        drain(keep=1)

    # bulk grouping state (bulk_group > 1): same-shape cases accumulate
    # and each group dispatches as one predict_bulk program
    buf: List[tuple] = []     # (stem, img, vol, (sx, sy))

    def submit_group():
        # auto-cap the group size to the largest non-spilling S for the
        # case shape and split oversized groups (module constant
        # BULK_HBM_BUDGET_BYTES; the round-3 CLI only warned and then
        # dispatched into the measured ×0.11 spill regime anyway)
        nonlocal buf
        if not buf:
            return
        per_case = 2 * 4 * buf[0][2].size
        cap = max(1, int(BULK_HBM_BUDGET_BYTES // per_case))
        if cap < len(buf):
            log(f"bulk group capped at {cap} case(s) "
                f"(~{per_case / 1e9:.2f} GB of device buffers each, "
                f"{BULK_HBM_BUDGET_BYTES / 1e9:.0f} GB HBM budget — "
                f"probe r36); splitting the group")
        while buf:
            chunk, buf = buf[:cap], buf[cap:]
            if len(chunk) == 1:
                # a singleton group (ragged tail, a shape change after one
                # case, or an HBM cap of 1) gains nothing from the bulk
                # program and would compile its own (1, N, H, W) variant —
                # reuse the single-case program (identical outputs by
                # construction; also what `cli warm` pre-compiles)
                submit_case(*chunk[0])
                continue
            metas = [(s, i, sp) for s, i, _, sp in chunk]
            group = np.stack([v for _, _, v, _ in chunk])
            handle = engine.predict_bulk_submit(group, thr)
            pending_q.append(("group", metas, handle))
            drain(keep=1)

    def flush_all():
        submit_group()
        drain(keep=0)

    # Depth-1 read-ahead: decode case i+1 on a worker thread while case i
    # is uploading/serving/writing.  Probe r39 measured the directory
    # pass as almost entirely HOST file IO (~0.9 GB zlib .mha decode per
    # case on this 1-core host + ~36 MB/s tunnel upload) against ~0.1 s
    # of device time — the decode is pure C (zlib/native inflate +
    # numpy), so it releases the GIL and genuinely overlaps the
    # network-bound upload and the device wait (probe r43 quantifies).
    # The worker thread does NO jax work: device dispatch stays on the
    # main thread.
    from concurrent.futures import ThreadPoolExecutor

    paths = sorted(Path(input_dir).iterdir())

    def _load(p):
        return read_mha(p) if p.suffix.lower() == ".mha" else None

    prefetch = ThreadPoolExecutor(max_workers=1)
    fut = (prefetch.submit(_load, paths[0])
           if paths and read_ahead else None)
    try:
      for i, p in enumerate(paths):
        preloaded = fut.result() if fut is not None else _load(p)
        fut = (prefetch.submit(_load, paths[i + 1])
               if read_ahead and i + 1 < len(paths) else None)
        ext = p.suffix.lower()
        if not (ext == ".mha" and not (slice_metrics or topk_viz)):
            flush_all()
        if ext in {".png", ".jpg", ".jpeg"}:
            sl = read_gray_png(p)
            probs = engine.predict_full(sl[None])
            mask = np.asarray(engine.refine(probs, thr))[0]
            write_gray_png(out_dir / f"{p.stem}_mask.png", mask * 255)

            if viz_att:
                import jax.numpy as jnp
                from ..evals.panels import save_attention_panel
                from ..ops.image import minmax_normalize_u8

                raw_u8 = np.asarray(
                    minmax_normalize_u8(jnp.asarray(sl[None])))[0]
                prob_att = np.asarray(probs)[0]
                # ψ only exists for gated models (the reference zeroes the
                # panel cell under --no_att, test_ablation.py:836)
                psi = (engine.psi_sweep(sl[None])[0] if cfg.model.use_att
                       else np.zeros_like(prob_att))
                if noatt_engine is not None:
                    prob_na = np.asarray(noatt_engine.predict_full(sl[None]))
                    mask_na = np.asarray(
                        noatt_engine.refine(prob_na, thr))[0]
                    prob_na = prob_na[0]
                else:
                    prob_na = np.zeros_like(prob_att)
                    mask_na = np.zeros_like(mask)
                save_attention_panel(p.stem, raw_u8, prob_att, psi,
                                     mask * 255, prob_na, mask_na * 255,
                                     out_dir / "panels")

            case_id, frame_idx = split_case_frame(p.stem)
            sp = spacing_from_map(spacing_map, case_id)
            if sp is None:
                log(f"no spacing for {case_id}, skip AC")
            else:
                ac = round(engine.measure(mask, sp), 1)
                rows.append((case_id, frame_idx, ac))
                log(f"{p.stem}: AC={ac:.1f} mm")

        elif ext == ".mha":
            img = preloaded if preloaded is not None else read_mha(p)
            vol = img.array
            sx, sy = float(img.spacing[0]), float(img.spacing[1])
            if not (slice_metrics or topk_viz):
                if bulk_group > 1:
                    # a different sweep shape closes the current group
                    # (one compile per (S, N, H, W) — engine docstring)
                    if buf and buf[0][2].shape != vol.shape:
                        submit_group()
                    buf.append((p.stem, img, vol, (sx, sy)))
                    if len(buf) >= bulk_group:
                        submit_group()
                    continue
                # fast path: refine only the top candidates (predict_case),
                # pipelined one case ahead
                submit_case(p.stem, img, vol, (sx, sy))
                continue

            # diagnostics need every refined frame — reference-shaped path
            probs = engine.predict_full(vol)
            masks = np.asarray(engine.refine(probs, thr))
            best = engine.select_best(masks)
            best_mask = masks[best]

            write_output_mha_and_json(out_dir, p.stem, best_mask, best, img)
            ac = round(engine.measure(best_mask, (sx, sy)), 1)
            rows.append((p.stem, int(best), ac))
            log(f"{p.stem}: best_frame={best}, AC={ac:.1f} mm")

            if slice_metrics:
                from ..evals.panels import write_slice_metrics_csv
                write_slice_metrics_csv(masks,
                                        out_dir / f"{p.stem}_slices.csv",
                                        p.stem)
            if topk_viz:
                import jax.numpy as jnp
                from ..evals.panels import save_topk_candidates
                from ..ops.image import minmax_normalize_u8

                areas = (masks > 0).sum(axis=(1, 2))
                k = max(1, min(cfg.predict.topk_frames, len(masks)))
                topk_idx = np.argsort(areas)[::-1][:k].tolist()
                imgs_u8 = np.asarray(minmax_normalize_u8(jnp.asarray(vol)))
                save_topk_candidates(imgs_u8, np.asarray(probs), masks,
                                     topk_idx, best, ac,
                                     out_dir / f"{p.stem}_topk.png")
    finally:
        prefetch.shutdown(wait=False)

    flush_all()
    if rows:
        csv_path = out_dir / "ac_results.csv"
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["case_id", "frame_idx", "ac_mm"])
            w.writerows(rows)
        log(f"AC saved → {csv_path} ({len(rows)})")
    return rows
