"""Evaluation suite + dataset tools + CLI wiring."""

import csv
import json
import uuid
from pathlib import Path

import numpy as np
import pytest
from scipy import ndimage as ndi

from att_aspp_unet_tpu.evals.ac_analysis import analyze_ac, melt_gt, read_pred
from att_aspp_unet_tpu.evals.reports import (attention_comparison,
                                             load_flat_images_masks,
                                             load_from_frame_index,
                                             make_dataset_reports,
                                             seg_eval_summary, summarize)
from att_aspp_unet_tpu.evals.seg_metrics import (dice, evaluate_directories,
                                                 hd95, iou, index_dir,
                                                 show_metric)
from att_aspp_unet_tpu.evals.visualize import render_worst_cases
from att_aspp_unet_tpu.io import write_gray_png, write_mha, MetaImage
from att_aspp_unet_tpu.tools.convert import (PositiveRule,
                                             area_threshold_px,
                                             convert_frames_with_negatives,
                                             select_positive_frames,
                                             window_to_u8)
from att_aspp_unet_tpu.tools.leak_check import check_split_leak
from att_aspp_unet_tpu.tools.split import split_train_val


# ---------------- metrics ----------------

def _disk(shape, cy, cx, r):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    return (((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r).astype(np.uint8) * 255


def test_dice_iou_basic():
    a = np.zeros((20, 20))
    b = np.zeros((20, 20))
    a[5:15, 5:15] = 1
    b[5:15, 5:15] = 1
    assert dice(a, b) == pytest.approx(1.0, abs=1e-6)
    assert iou(a, b) == pytest.approx(1.0, abs=1e-6)
    b2 = np.roll(b, 5, axis=0)
    assert dice(a, b2) == pytest.approx(0.5, abs=1e-2)


def test_hd95_identical_and_shifted():
    a = _disk((64, 64), 32, 32, 15)
    assert hd95(a, a) == pytest.approx(0.0, abs=1e-9)
    b = np.roll(a, 4, axis=1)
    h = hd95(a, b)
    assert 2.0 <= h <= 5.0
    assert np.isnan(hd95(a, np.zeros_like(a)))


def _write_eval_dirs(tmp_path, n_cases=8):
    gt_d = tmp_path / "gt"
    base_d = tmp_path / "base"
    new_d = tmp_path / "new"
    for d in (gt_d, base_d, new_d):
        d.mkdir()
    rng = np.random.default_rng(0)
    cids = []
    for i in range(n_cases):
        cid = str(uuid.uuid4())
        cids.append(cid)
        gt = _disk((48, 48), 24, 24, 12)
        base = _disk((48, 48), 24, 26, 11)          # worse
        new = _disk((48, 48), 24, 24 + (i % 2), 12)  # better
        write_gray_png(gt_d / f"{cid}.png", gt)
        write_gray_png(base_d / f"{cid}.png", base)
        write_gray_png(new_d / f"{cid}_mask.png", new)
    return gt_d, base_d, new_d, cids


def test_evaluate_directories(tmp_path):
    gt_d, base_d, new_d, cids = _write_eval_dirs(tmp_path)
    rows = evaluate_directories(gt_d, base_d, new_d,
                                out_csv=tmp_path / "seg_eval.csv",
                                plot_dir=tmp_path / "plots",
                                log=lambda *a: None)
    assert len(rows) == len(cids)
    lines = (tmp_path / "seg_eval.csv").read_text().strip().splitlines()
    assert lines[0].startswith("case,dice_new,iou_new,hd95_new_px")
    assert (tmp_path / "plots/dice_hist.png").exists()
    # new model is better by construction
    mean_new = np.mean([r[1] for r in rows])
    mean_base = np.mean([r[4] for r in rows])
    assert mean_new > mean_base


def test_index_dir_uuid(tmp_path):
    cid = str(uuid.uuid4())
    write_gray_png(tmp_path / f"{cid}_extra.png", np.zeros((4, 4), np.uint8))
    idx = index_dir(tmp_path)
    assert cid in idx


# ---------------- AC analysis ----------------

def test_melt_and_read_pred(tmp_path):
    import pandas as pd

    gt = pd.DataFrame({
        "uuid": ["A", "B"],
        "sweep_1_ac_mm": [100.0, 110.0],
        "sweep_2_ac_mm": [105.0, np.nan],
    })
    long = melt_gt(gt)
    assert set(long.columns) == {"case_id", "sweep_idx", "gt_ac_mm"}
    assert len(long) == 3

    pred_csv = tmp_path / "p.csv"
    pd.DataFrame({"case_id": ["A", "B"], "frame_idx": [10, 150],
                  "ac_mm": [99.0, 111.0]}).to_csv(pred_csv, index=False)
    pred = read_pred(pred_csv, "m", fps=140)
    assert pred["sweep_idx"].tolist() == [1, 2]


def test_analyze_ac(tmp_path):
    import pandas as pd

    gt_csv = tmp_path / "gt.csv"
    pd.DataFrame({
        "uuid": ["A", "B", "C"],
        "sweep_1_ac_mm": [100.0, 120.0, 90.0],
    }).to_csv(gt_csv, index=False)
    for name, delta in (("base.csv", 5.0), ("new.csv", 1.0)):
        pd.DataFrame({"case_id": ["A", "B", "C"], "frame_idx": [5, 9, 12],
                      "ac_mm": [100.0 + delta, 120.0 + delta, 90.0 + delta]}
                     ).to_csv(tmp_path / name, index=False)
    res = analyze_ac(gt_csv, tmp_path / "base.csv", tmp_path / "new.csv",
                     tmp_path / "out", log=lambda *a: None)
    m = res["metrics"]
    assert m.loc["baseline", "MAE_mm"] == pytest.approx(5.0, abs=0.01)
    assert m.loc["attention_aspp_unet", "MAE_mm"] == pytest.approx(1.0, abs=0.01)
    assert (tmp_path / "out/merged_ac_values.csv").exists()
    assert (tmp_path / "out/scatter_baseline.png").exists()


# ---------------- visualization ----------------

def test_render_worst_cases(tmp_path):
    gt_d, base_d, new_d, cids = _write_eval_dirs(tmp_path, n_cases=4)
    evaluate_directories(gt_d, base_d, new_d,
                         out_csv=tmp_path / "seg_eval.csv",
                         log=lambda *a: None)
    n = render_worst_cases(tmp_path / "seg_eval.csv", gt_d, base_d, new_d,
                           tmp_path / "vis", top=2, log=lambda *a: None)
    assert n == 2
    assert (tmp_path / "vis/dice_scatter.png").exists()
    overlays = list((tmp_path / "vis").glob("*_overlay.png"))
    assert len(overlays) == 2


# ---------------- reports ----------------

def test_dataset_reports_flat(tmp_path, rng):
    for i in range(6):
        img = (rng.random((16, 16)) * 255).astype(np.uint8)
        msk = np.zeros((16, 16), np.uint8)
        if i % 2 == 0:
            msk[4:10, 4:10] = 255
        write_gray_png(tmp_path / "data/train/images" / f"case{i:02d}_s001.png", img)
        write_gray_png(tmp_path / "data/train/masks" / f"case{i:02d}_s001.png", msk)
    df = load_flat_images_masks(tmp_path / "data")
    assert len(df) == 6
    assert (df["cls"] == "pos").sum() == 3
    make_dataset_reports(df, tmp_path / "reports", log=lambda *a: None)
    assert (tmp_path / "reports/split_stats.csv").exists()
    assert (tmp_path / "reports/latex_table_split_stats.tex").exists()


def test_load_from_frame_index(tmp_path):
    fi = tmp_path / "frame_indices.json"
    fi.write_text(json.dumps({"caseA": {"pos": [1, 2], "neg": [7]}}))
    df = load_from_frame_index(fi)
    assert len(df) == 3
    assert (df["cls"] == "neg").sum() == 1


def test_seg_eval_summary_and_attention_comparison(tmp_path):
    import pandas as pd

    df = pd.DataFrame({
        "case": [f"c{i}" for i in range(6)],
        "dice_new": [0.9, 0.92, 0.88, 0.95, 0.91, 0.93],
        "dice_base": [0.85, 0.80, 0.83, 0.90, 0.86, 0.82],
        "iou_new": [0.8] * 6, "iou_base": [0.7] * 6,
        "hd95_new_px": [3.0] * 6, "hd95_base_px": [5.0] * 6,
        "dice_diff": [0.05, 0.12, 0.05, 0.05, 0.05, 0.11],
        "iou_diff": [0.1] * 6, "hd95_diff": [-2.0] * 6,
    })
    p1 = tmp_path / "a.csv"
    p2 = tmp_path / "b.csv"
    df.to_csv(p1, index=False)
    df.assign(dice_new=df["dice_new"] - 0.05).to_csv(p2, index=False)

    out = seg_eval_summary(p1, log=lambda *a: None)
    row = out[out.metric == "dice"].iloc[0]
    assert row["new_mean"] > row["base_mean"]       # columns NOT swapped

    merged = attention_comparison(p1, p2, tmp_path / "cmp",
                                  log=lambda *a: None)
    assert (merged["delta_dice"] > 0).all()
    assert (tmp_path / "cmp/dice_paired.png").exists()


# ---------------- tools ----------------

def test_window_to_u8(rng):
    sl = rng.normal(100, 30, (32, 32)).astype(np.float32)
    u8 = window_to_u8(sl)
    assert u8.dtype == np.uint8 and u8.max() == 255 and u8.min() == 0
    assert (window_to_u8(np.full((8, 8), 3.0)) == 0).all()


def test_area_threshold_px():
    assert area_threshold_px(PositiveRule(min_area_mm2=None, min_area_px=100),
                             (0.28, 0.28)) == 100
    assert area_threshold_px(PositiveRule(min_area_mm2=80.0, min_area_px=100),
                             (0.28, 0.28)) == int(np.ceil(80 / 0.28 ** 2))
    assert area_threshold_px(PositiveRule(min_area_mm2=80.0, min_area_px=100),
                             None) == 100


def test_select_positive_frames_neighbor_pad():
    areas = np.array([0, 50, 300, 0, 200, 190, 0, 0])
    rule = PositiveRule(topk=2, neighbor_pad=1, min_area_px=100)
    got = select_positive_frames(areas, 100, rule)
    # top-2 = frames 2, 4; ±1 neighbours below threshold are dropped,
    # neighbour 5 (area 190 ≥ thr) is kept
    assert got.tolist() == [2, 4, 5]
    assert select_positive_frames(areas, 400, rule).size == 0


def test_convert_frames_with_negatives(tmp_path, rng):
    root = tmp_path / "mha"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    img = (rng.random((10, 32, 32)) * 400).astype(np.int16)
    msk = np.zeros((10, 32, 32), np.uint8)
    msk[3, 8:24, 8:24] = 1     # 256 px
    msk[4, 8:20, 8:20] = 1     # 144 px
    msk[7, 14:18, 14:18] = 1   # 16 px (below threshold)
    write_mha(root / "images/caseX.mha", MetaImage(img, spacing=(0.5, 0.5, 0.5)))
    write_mha(root / "masks/caseX.mha", MetaImage(msk, spacing=(0.5, 0.5, 0.5)))

    idx = convert_frames_with_negatives(
        root, tmp_path / "png", topk=2, min_area_mm2=None, min_area_px=100,
        neg_strategy="stride", neg_stride=3, neg_cap=2, log=lambda *a: None)
    assert idx["caseX"]["pos"] == [3, 4]
    assert len(idx["caseX"]["neg"]) == 2
    assert (tmp_path / "png/images/caseX_s003.png").exists()
    assert (tmp_path / "png/masks/frame_indices.json").exists()
    mapping = (tmp_path / "png/mapping.csv").read_text().splitlines()
    assert mapping[0] == "case_id,frame_idx"
    assert len(mapping) == 1 + 4


def test_split_train_val(tmp_path, rng):
    raw = tmp_path / "raw"
    (raw / "images").mkdir(parents=True)
    (raw / "masks").mkdir()
    for i in range(10):
        write_gray_png(raw / "images" / f"f{i}.png", np.zeros((4, 4), np.uint8))
        write_gray_png(raw / "masks" / f"f{i}.png", np.zeros((4, 4), np.uint8))
    splits = split_train_val(raw, tmp_path / "out", log=lambda *a: None)
    assert len(splits["train"]) == 8 and len(splits["val"]) == 2
    assert len(list((tmp_path / "out/train/images").glob("*.png"))) == 8
    assert len(list((tmp_path / "out/val/masks").glob("*.png"))) == 2


def test_leak_check(tmp_path):
    (tmp_path / "train").mkdir()
    (tmp_path / "val").mkdir()
    for n in ("a.png", "b.png"):
        (tmp_path / "train" / n).write_bytes(b"x")
    (tmp_path / "val" / "b.png").write_bytes(b"x")
    res = check_split_leak(tmp_path / "train", tmp_path / "val",
                           tmp_path / "check", log=lambda *a: None)
    assert res["present"] == ["b.png"]               # leak detected
    assert res["missing_in_val"] == ["a.png"]
    assert (tmp_path / "check/present.txt").read_text() == "b.png"


# ---------------- CLI wiring ----------------

def test_cli_parser_subcommands():
    from att_aspp_unet_tpu.cli import get_parser

    p = get_parser()
    args = p.parse_args(["train", "--train_dir", "x"])
    assert args.cmd == "train" and args.base_c == 48
    args = p.parse_args(["eval-ac", "--gt", "a", "--baseline", "b", "--new", "c"])
    assert args.fps == 140
    args = p.parse_args(["infer-container", "--model-tag", "att_aspp"])
    assert args.model_tag == "att_aspp"


def test_cli_train_lowering_default():
    """Training defaults to the packed 512-level lowering (NOTES.md r22:
    x1.38 on hardware, f64-exact vs direct); --lowering direct opts out.
    Serving parsers are unaffected (direct default)."""
    from att_aspp_unet_tpu.cli import get_parser

    p = get_parser()
    assert p.parse_args(["train", "--train_dir", "x"]).lowering == "w2d_stage"
    assert p.parse_args(["train", "--train_dir", "x", "--lowering",
                         "direct"]).lowering == "direct"


def test_cli_reference_ablation_flags():
    """The reference ablation CLI's flag set parses and reaches the config
    (test_ablation.py:894-903): --no_edge_loss, --deterministic,
    --viz_att, --weights_noatt."""
    from att_aspp_unet_tpu.cli import _base_config, get_parser

    p = get_parser()
    args = p.parse_args(["train", "--train_dir", "x", "--no_edge_loss",
                         "--deterministic"])
    assert args.no_edge_loss and args.deterministic
    assert _base_config(args).train.loss.edge_weight == 0.0
    args = p.parse_args(["train", "--train_dir", "x", "--edge_w", "0.1"])
    assert _base_config(args).train.loss.edge_weight == 0.1

    args = p.parse_args(["predict", "--weights", "w", "--input_dir", "i",
                         "--viz_att", "--weights_noatt", "na",
                         "--deterministic"])
    assert args.viz_att and args.weights_noatt == "na"
    args = p.parse_args(["calibrate", "--weights", "w", "--val_dir", "v",
                         "--deterministic"])
    assert args.deterministic


def test_cli_leak_check_end_to_end(tmp_path, monkeypatch):
    from att_aspp_unet_tpu.cli import main

    (tmp_path / "train").mkdir()
    (tmp_path / "val").mkdir()
    (tmp_path / "train/a.png").write_bytes(b"x")
    rc = main(["leak-check", "--train", str(tmp_path / "train"),
               "--val", str(tmp_path / "val"),
               "--out", str(tmp_path / "check")])
    assert rc == 0                                   # no leak


def test_cli_warm_compiles_declared_shapes(capsys):
    """`cli warm` runs the serving program for each declared shape (the
    deployment cold-start tool; shapes, not content, determine the HLO)."""
    from att_aspp_unet_tpu.cli import main

    rc = main(["warm", "--shapes", "3x40x48,2x24x28", "--base_c", "4",
               "--img-size", "32", "--cascade"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("[warm]") == 2 and "3x40x48" in out


def test_cli_warm_bulk_compiles_group_program(capsys):
    """`warm --bulk N` also pre-compiles the predict --bulk group program
    (a bulk group is its own (S, N, H, W) jit program — without this a
    deployment serving --bulk pays the cold compile warm exists to
    prevent); --bulk without --cascade is a loud error."""
    import pytest

    from att_aspp_unet_tpu.cli import main

    rc = main(["warm", "--shapes", "2x24x28", "--base_c", "4",
               "--img-size", "32", "--cascade", "--bulk", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "[warm] bulk 2x2x24x28" in out

    with pytest.raises(SystemExit):
        main(["warm", "--shapes", "2x24x28", "--base_c", "4",
              "--img-size", "32", "--bulk", "2"])

    # --bulk 1 passes the cascade guard but warms no bulk program (groups
    # need >= 2 cases) — a typo must fail loud, not silently warm nothing
    # (advisor r3 finding)
    with pytest.raises(SystemExit):
        main(["warm", "--shapes", "2x24x28", "--base_c", "4",
              "--img-size", "32", "--cascade", "--bulk", "1"])


def test_cli_predict_scout_flags_require_cascade(tmp_path):
    """The scout flags only affect the cascade tier-1 ranking; without
    --cascade they would be silently ignored (user believes the distilled
    scout is serving, gets the exhaustive path) — the CLI rejects them the
    same way predict_directory rejects --bulk without cascade."""
    import pytest

    from att_aspp_unet_tpu.cli import main

    for extra in (["--scout_weights", str(tmp_path / "w.npz")],
                  ["--scout_thr", "0.4"],
                  ["--scout_base_c", "8"],
                  ["--scout_no_clahe"],
                  ["--scout_rank", "closed"],
                  # --bulk 1 would silently serve the per-case path
                  # (groups need >= 2) — reject like `warm --bulk 1`
                  ["--cascade", "--bulk", "1"]):
        with pytest.raises(SystemExit):
            main(["predict", "--weights", str(tmp_path / "none.npz"),
                  "--input_dir", str(tmp_path)] + extra)
