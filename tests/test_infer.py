"""End-to-end inference: engines, container contract, predict CLI, calibrate.

Random weights suffice to validate shapes and the output contract
(SURVEY.md §7 step 3); value parity comes from the torch-import tests.
"""

import dataclasses
import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from att_aspp_unet_tpu.config import (CalibrateConfig, Config, ContainerConfig,
                                      ModelConfig, PlainUNetConfig,
                                      PredictConfig, PreprocessConfig)
from att_aspp_unet_tpu.infer.calibrate import calibrate
from att_aspp_unet_tpu.infer.container import run, select_labeled_mask_and_frame
from att_aspp_unet_tpu.infer.engine import (AttAsppEngine, BaselineEngine,
                                            resize_mask_to,
                                            select_mask_and_frame)
from att_aspp_unet_tpu.infer.predict_cli import (load_threshold,
                                                 predict_directory,
                                                 spacing_from_map,
                                                 split_case_frame)
from att_aspp_unet_tpu.io import MetaImage, read_json, read_mha, write_mha, \
    write_gray_png
from att_aspp_unet_tpu.models import AttentionASPPUNet, PlainConvUNet


def _tiny_cfg():
    return Config(
        preprocess=PreprocessConfig(img_size=64),
        model=ModelConfig(base_c=4, compute_dtype="float32"),
        plain_unet=PlainUNetConfig(base_c=4, max_c=16, n_stages=3,
                                   patch_size=(32, 32),
                                   compute_dtype="float32"),
        predict=PredictConfig(frame_batch=4, roi_size=32, subsample_frames=6),
    )


@pytest.fixture(scope="module")
def tiny_att():
    cfg = _tiny_cfg()
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    return cfg, variables


@pytest.fixture(scope="module")
def tiny_baseline():
    cfg = _tiny_cfg()
    model = PlainConvUNet.from_config(cfg.plain_unet)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32), train=False)
    return cfg, variables


def _sweep(rng, n=5, h=40, w=48):
    s = (rng.random((n, h, w)) * 200).astype(np.uint8)
    s[2, 10:30, 10:38] = 250          # bright blob on frame 2
    return s


def test_predict_full_shapes(tiny_att, rng):
    cfg, variables = tiny_att
    sweep = _sweep(rng)
    eng = AttAsppEngine(cfg, variables)
    probs = np.asarray(eng.predict_full(sweep))
    assert probs.shape == sweep.shape
    assert probs.min() >= 0 and probs.max() <= 1
    masks = np.asarray(eng.refine(probs, 0.5))
    assert masks.shape == sweep.shape
    assert set(np.unique(masks)).issubset({0, 1})


def test_predict_roi_shapes(tiny_att, rng):
    cfg, variables = tiny_att
    sweep = _sweep(rng, n=9)
    eng = AttAsppEngine(cfg, variables)
    probs = np.asarray(eng.predict_roi(sweep))
    assert probs.shape == (6, 40, 48)        # subsampled to 6 frames
    masks = np.asarray(eng.postprocess_roi(probs))
    nonzero_frames = (masks.sum((1, 2)) > 0).sum()
    assert nonzero_frames <= 1               # only the selected frame


def test_baseline_engine(tiny_baseline, rng):
    cfg, variables = tiny_baseline
    sweep = _sweep(rng, n=3)
    eng = BaselineEngine(cfg, variables)
    probs = np.asarray(eng.predict(sweep))
    assert probs.shape == (3, 3, 40, 48)     # (C, N, H, W)
    np.testing.assert_allclose(probs.sum(axis=0), 1.0, atol=1e-4)
    seg = np.asarray(eng.postprocess(probs))
    assert seg.shape == (3, 40, 48)
    assert set(np.unique(seg)).issubset({0, 1, 2})


def test_select_mask_and_frame():
    stack = np.zeros((4, 8, 8), np.uint8)
    stack[2, 1:5, 1:5] = 1
    sel, fr = select_mask_and_frame(stack)
    assert fr == 2 and sel.sum() == 16
    sel, fr = select_mask_and_frame(np.zeros((4, 8, 8), np.uint8))
    assert fr == -1 and sel.sum() == 0
    sel, fr = select_mask_and_frame(np.ones((8, 8), np.uint8))
    assert fr == 0


def test_select_labeled_mask_and_frame():
    seg = np.zeros((3, 8, 8), np.uint8)
    seg[0, :2, :2] = 1                       # class1 area 4
    seg[1, :3, :4] = 2                       # class2 area 12 ← winner
    m, fr = select_labeled_mask_and_frame(seg)
    assert fr == 1 and m.sum() == 12 and set(np.unique(m)).issubset({0, 1})
    m, fr = select_labeled_mask_and_frame(np.zeros((2, 4, 4), np.uint8))
    assert fr == -1


def test_select_labeled_sequential_ladder():
    """Reference model.py:115-130 quirk: class-1 is checked first per frame;
    when it beats the running best, class 2 of the SAME frame is never
    consulted — so a later, smaller class-2 region can steal the frame from
    an earlier frame whose class-2 area was actually the largest overall."""
    seg = np.zeros((2, 8, 8), np.uint8)
    seg[0, 0, :5] = 1                        # frame0: a1 = 5 (wins, a2 skipped)
    seg[0, 1:6, :4] = 2                      # frame0: a2 = 20 (never consulted)
    seg[1, :2, :4] = 2                       # frame1: a2 = 8 > 5 → steals
    m, fr = select_labeled_mask_and_frame(seg)
    assert fr == 1 and m.sum() == 8          # max(a1,a2) logic would pick 0


def test_resize_mask_roundtrip():
    m = np.zeros((10, 10), np.uint8)
    m[2:8, 2:8] = 1
    up = resize_mask_to(m, (25, 31))
    assert up.shape == (25, 31) and set(np.unique(up)).issubset({0, 1})


def _make_case_dir(tmp_path, rng, n=6, h=40, w=48):
    in_dir = tmp_path / "input/images/stacked-fetal-ultrasound"
    in_dir.mkdir(parents=True)
    sweep = _sweep(rng, n, h, w)
    write_mha(in_dir / "case-0001_1_0000.mha",
              MetaImage(sweep, spacing=(0.28, 0.28, 0.28)))
    return sweep


@pytest.mark.parametrize("tag", ["att_aspp", "baseline"])
def test_container_run_contract(tiny_att, tiny_baseline, tmp_path, rng, tag):
    cfg, var_att = tiny_att
    _, var_base = tiny_baseline
    sweep = _make_case_dir(tmp_path, rng)
    ccfg = ContainerConfig(input_path=str(tmp_path / "input"),
                           output_path=str(tmp_path / "output"),
                           model_tag=tag, case_id="case42")
    cfg2 = dataclasses.replace(cfg, container=ccfg)
    variables = var_att if tag == "att_aspp" else var_base

    rc = run(cfg2, variables, save_probabilities=False, debug_frames=True,
             log=lambda *a: None)
    assert rc == 0

    out_mha = tmp_path / "output/images/fetal-abdomen-segmentation/case42.mha"
    out_json = tmp_path / "output/fetal-abdomen-frame-number.json"
    assert out_mha.exists() and out_json.exists()

    vol = read_mha(out_mha)
    assert vol.array.shape == sweep.shape
    assert vol.array.dtype == np.uint8
    # container contract: re-binarised to {0,1} (reference inference.py:230-235)
    assert set(np.unique(vol.array)).issubset({0, 1})
    assert vol.spacing == pytest.approx((0.28, 0.28, 0.28))

    frame = json.loads(out_json.read_text())
    assert isinstance(frame, int) and -1 <= frame < sweep.shape[0]
    if frame >= 0:
        assert (vol.array[frame] > 0).any()
        others = np.delete(vol.array, frame, axis=0)
        assert others.sum() == 0
    # debug frame dumps
    assert (tmp_path / "output/images/frame000_orig.png").exists()


def test_container_aot_boot_path(tiny_att, tmp_path, rng, monkeypatch,
                                 capfd):
    """The AOT boot contract (VERDICT r4 #7): with ``ATT_ASPP_AOT_DIR``
    set, the container consults the AOT directory for the ROI program —
    logging ``[aot] _predict_roi_impl … hit|MISS`` so a deployment can
    assert its boot path — and a miss serves identical outputs through
    jit.  Where the backend can serialize, the exported entry's key must
    equal the serve-time fingerprint (the hit round-trip itself is
    hardware territory — probe r41 / CPU PJRT execution quirks)."""
    import io
    import json as _json

    from att_aspp_unet_tpu.infer.container import run_from_env
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    cfg, variables = tiny_att
    _make_case_dir(tmp_path, rng)
    ccfg = ContainerConfig(input_path=str(tmp_path / "input"),
                           output_path=str(tmp_path / "out_ref"),
                           model_tag="att_aspp", case_id="caseA")
    # reference run, no AOT
    monkeypatch.delenv("ATT_ASPP_AOT_DIR", raising=False)
    assert run_from_env(dataclasses.replace(cfg, container=ccfg), variables,
                        save_probabilities=False, debug_frames=False,
                        log=lambda *a: None) == 0
    capfd.readouterr()

    aot_dir = tmp_path / "aot"
    aot_dir.mkdir()
    monkeypatch.setenv("ATT_ASPP_AOT_DIR", str(aot_dir))
    ccfg2 = dataclasses.replace(ccfg, output_path=str(tmp_path / "out_aot"))
    assert run_from_env(dataclasses.replace(cfg, container=ccfg2), variables,
                        save_probabilities=False, debug_frames=False,
                        log=lambda *a: None) == 0
    err = capfd.readouterr().err
    assert "[aot] _predict_roi_impl" in err           # boot path is asserted
    assert "MISS (jit fallback)" in err               # empty dir → jit

    ref = read_mha(tmp_path / "out_ref/images/fetal-abdomen-segmentation/"
                   "caseA.mha").array
    got = read_mha(tmp_path / "out_aot/images/fetal-abdomen-segmentation/"
                   "caseA.mha").array
    np.testing.assert_array_equal(got, ref)
    assert (_json.loads((tmp_path / "out_aot/fetal-abdomen-frame-number"
                         ".json").read_text())
            == _json.loads((tmp_path / "out_ref/fetal-abdomen-frame-number"
                            ".json").read_text()))

    # export → fingerprint identity (hit round-trip is hardware territory)
    eng = AttAsppEngine(cfg, variables)
    n, H, W = 6, 40, 48
    try:
        keys = eng.export_aot(aot_dir, [(n, H, W)], roi=True,
                              log=lambda *a: None)
    except Exception as e:
        if "serializ" not in str(e).lower():
            raise
        pytest.skip(f"backend cannot serialize this executable: {e}")
    n_sub = min(cfg.predict.subsample_frames, n)
    staged, _ = eng._stage_frames(np.zeros((n_sub, H, W), np.uint8))
    rfn, rstatics, rdyn = eng._roi_program(staged)
    assert eng._aot_fingerprint(rfn, rstatics, rdyn, staged) in keys


def test_predict_directory(tiny_att, tmp_path, rng):
    cfg, variables = tiny_att
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    img = (rng.random((40, 48)) * 255).astype(np.uint8)
    write_gray_png(in_dir / "caseA_s3.png", img)
    sweep = _sweep(rng, 4)
    write_mha(in_dir / "caseB.mha", MetaImage(sweep, spacing=(0.3, 0.3, 0.3)))
    spacing_json = tmp_path / "spacing.json"
    spacing_json.write_text(json.dumps({"caseA": {"spacing": [0.28, 0.28]}}))

    rows = predict_directory(cfg, variables, in_dir, tmp_path / "out",
                             spacing_json=spacing_json, threshold=0.5,
                             log=lambda *a: None)
    assert (tmp_path / "out/caseA_s3_mask.png").exists()
    assert (tmp_path / "out/caseB/images/fetal-abdomen-segmentation/output.mha").exists()
    assert (tmp_path / "out/caseB/fetal-abdomen-frame-number.json").exists()
    csv_path = tmp_path / "out/ac_results.csv"
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "case_id,frame_idx,ac_mm"
    assert len(lines) == 1 + len(rows)
    cases = {r[0] for r in rows}
    assert "caseA" in cases and "caseB" in cases


def test_predict_directory_bulk_matches_per_case(tiny_att, tmp_path, rng):
    """--bulk N on the predict CLI: consecutive same-shape .mha cases run
    as one predict_bulk program per group; rows, written volumes and
    frame JSONs must match the per-case cascade run file for file.  A
    shape change mid-directory closes the group early; bulk without
    cascade is a loud error."""
    import dataclasses as dc

    cfg, variables = tiny_att
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, n in enumerate((8, 8, 8, 4)):      # last case breaks the shape
        sweep = _sweep(rng, n)
        sweep[n // 2, 8:30, 10:40] = 250
        write_mha(in_dir / f"case{i}.mha",
                  MetaImage(sweep, spacing=(0.3, 0.3, 0.3)))

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=4,
        cascade_scout_batch=4, bulk_frame_batch=4))
    ref = predict_directory(ccfg, variables, in_dir, tmp_path / "ref",
                            threshold=0.5, log=lambda *a: None)
    got = predict_directory(ccfg, variables, in_dir, tmp_path / "bulk",
                            threshold=0.5, bulk_group=2,
                            log=lambda *a: None)
    assert got == ref and len(got) == 4
    for i in range(4):
        a = read_mha(tmp_path / "ref" / f"case{i}" / "images"
                     / "fetal-abdomen-segmentation" / "output.mha")
        b = read_mha(tmp_path / "bulk" / f"case{i}" / "images"
                     / "fetal-abdomen-segmentation" / "output.mha")
        np.testing.assert_array_equal(a.array, b.array)

    with pytest.raises(ValueError):
        predict_directory(cfg, variables, in_dir, tmp_path / "nope",
                          threshold=0.5, bulk_group=2, log=lambda *a: None)


def test_predict_directory_bulk_hbm_autocap(tiny_att, tmp_path, rng,
                                            monkeypatch):
    """Oversized bulk groups SPLIT to the largest non-spilling size
    instead of warning and dispatching into the HBM-cliff regime (probe
    r36 measured ×0.11 past ~6 GB; VERDICT r3 #7).  With the budget
    monkeypatched so only 2 cases fit, --bulk 4 over 5 same-shape cases
    must dispatch groups of (2, 2) plus a singleton via the single-case
    program — and outputs must still match per-case serving in order."""
    import dataclasses as dc

    import att_aspp_unet_tpu.infer.predict_cli as pcli
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    cfg, variables = tiny_att
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(5):
        sweep = _sweep(rng, 8)
        sweep[4, 8:30, 10:40] = 250
        write_mha(in_dir / f"case{i}.mha",
                  MetaImage(sweep, spacing=(0.3, 0.3, 0.3)))

    per_case_bytes = 2 * 4 * (8 * 40 * 48)
    monkeypatch.setattr(pcli, "BULK_HBM_BUDGET_BYTES", 2.5 * per_case_bytes)
    group_sizes = []
    orig_bulk = AttAsppEngine.predict_bulk_submit
    orig_case = AttAsppEngine.predict_case_submit

    def spy_bulk(self, group, thr=None):
        group_sizes.append(int(group.shape[0]))
        return orig_bulk(self, group, thr)

    def spy_case(self, vol, thr=None):
        group_sizes.append(1)
        return orig_case(self, vol, thr)

    monkeypatch.setattr(AttAsppEngine, "predict_bulk_submit", spy_bulk)
    monkeypatch.setattr(AttAsppEngine, "predict_case_submit", spy_case)

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=4,
        cascade_scout_batch=4, bulk_frame_batch=4))
    logs = []
    got = predict_directory(ccfg, variables, in_dir, tmp_path / "out",
                            threshold=0.5, bulk_group=4,
                            log=lambda *a: logs.append(" ".join(map(str, a))))
    assert group_sizes == [2, 2, 1], group_sizes
    assert any("capped" in l for l in logs), logs
    assert [r[0] for r in got] == [f"case{i}" for i in range(5)]

    monkeypatch.setattr(AttAsppEngine, "predict_bulk_submit", orig_bulk)
    monkeypatch.setattr(AttAsppEngine, "predict_case_submit", orig_case)
    ref = predict_directory(ccfg, variables, in_dir, tmp_path / "ref",
                            threshold=0.5, log=lambda *a: None)
    assert got == ref


def test_split_case_frame_and_spacing_map():
    assert split_case_frame("uuid_s17") == ("uuid", 17)
    assert split_case_frame("plain") == ("plain", -1)
    assert split_case_frame("x_sbad") == ("x", -1)
    m = {"a": [0.1, 0.2], "b": {"spacing": [0.3, 0.4, 1.0]}, "c": 5}
    assert spacing_from_map(m, "a") == (0.1, 0.2)
    assert spacing_from_map(m, "b") == (0.3, 0.4)
    assert spacing_from_map(m, "c") is None
    assert spacing_from_map(m, "missing") is None


def test_load_threshold(tmp_path):
    cfg = _tiny_cfg()
    assert load_threshold(cfg, tmp_path / "none.json",
                          log=lambda *a: None) == 0.48
    (tmp_path / "thr.json").write_text('{"best_thr": 0.37}')
    assert load_threshold(cfg, tmp_path / "thr.json",
                          log=lambda *a: None) == 0.37
    (tmp_path / "bad.json").write_text("not json")
    assert load_threshold(cfg, tmp_path / "bad.json",
                          log=lambda *a: None) == 0.48


def test_calibrate(tiny_att, tmp_path, rng):
    """Mixed-resolution val set: the batched calibrate groups images by
    native (H, W) — each group is ONE predict_full + ONE Dice-surface
    dispatch — and must keep per-image curve rows in file order."""
    cfg, variables = tiny_att
    cfg = dataclasses.replace(cfg, calibrate=CalibrateConfig(
        thr_lo=0.3, thr_hi=0.7, thr_steps=5, with_ci=True))
    val = tmp_path / "val"
    (val / "images").mkdir(parents=True)
    (val / "masks").mkdir()
    shapes = [(40, 48), (32, 40), (40, 48)]   # v1 is its own group
    for i, hw in enumerate(shapes):
        img = (rng.random(hw) * 255).astype(np.uint8)
        msk = np.zeros(hw, np.uint8)
        msk[hw[0] // 4: -hw[0] // 4, hw[1] // 4: -hw[1] // 4] = 255
        write_gray_png(val / "images" / f"v{i}.png", img)
        write_gray_png(val / "masks" / f"v{i}.png", msk)

    out = calibrate(cfg, variables, val, tmp_path / "ck", log=lambda *a: None)
    assert 0.3 <= out["best_thr"] <= 0.7
    assert out["curves"].shape == (3, 5)
    thr = read_json(tmp_path / "ck/thr.json")
    assert thr["best_thr"] == out["best_thr"]
    assert (tmp_path / "ck/calibrate_curve.csv").exists()
    assert (tmp_path / "ck/calibrate_raw.csv").exists()

    # row order == sorted file order: recompute image 1 (the odd-sized one)
    # alone and compare its curve
    from att_aspp_unet_tpu.infer.calibrate import dice_curves
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.io import read_gray_png

    eng = AttAsppEngine(cfg, variables)
    probs = eng.predict_full(read_gray_png(val / "images/v1.png")[None])
    gt = (read_gray_png(val / "masks/v1.png") > 127)[None]
    solo = np.asarray(dice_curves(probs, jnp.asarray(gt),
                                  jnp.linspace(0.3, 0.7, 5)))[0]
    np.testing.assert_allclose(out["curves"][1], solo, rtol=1e-6)


def test_predict_case_matches_refine_everything(tiny_att, rng):
    """predict_case (top-M refine) must agree with the reference-shaped
    refine-every-frame → select_best path on frame AND mask.

    Threshold at a high probability quantile so the binary masks are blobby
    islands like real segmentations — at thr 0.5 a random-weight model
    foregrounds half of every frame, where candidate ranking is pure noise
    and the top-M shortcut is (documented to be) unreliable."""
    cfg, variables = tiny_att
    eng = AttAsppEngine(cfg, variables)
    sweep = _sweep(rng, 10, 40, 48)

    probs = eng.predict_full(sweep)
    thr = float(np.quantile(np.asarray(probs), 0.97))
    frame, mask, ac = eng.predict_case(sweep, (0.28, 0.28), threshold=thr)

    masks = np.asarray(eng.refine(probs, thr))
    ref_frame = eng.select_best(masks)

    assert frame == ref_frame
    np.testing.assert_array_equal(mask, masks[ref_frame])
    assert np.isfinite(ac) and ac >= 0.0


def test_predict_case_empty_sweep(tiny_att):
    """All-background input → a valid (frame, empty-ish mask, 0 AC) triple."""
    cfg, variables = tiny_att
    eng = AttAsppEngine(cfg, variables)
    sweep = np.zeros((6, 40, 48), np.uint8)
    frame, mask, ac = eng.predict_case(sweep, (0.28, 0.28), threshold=0.99)
    assert 0 <= frame < 6 and mask.sum() == 0 and ac == 0.0


def test_candidate_rank_counts_ring_interiors():
    """The candidate cut must rank a thin ring by its FILLED area (the
    reference selects top-k by refined — hole-filled — area): a 2-px
    abdomen-rim annulus with a large interior must out-rank a solid blob
    that beats it on raw thresholded area."""
    import jax.numpy as jnp

    from att_aspp_unet_tpu.infer.engine import candidate_rank_areas

    H = W = 120
    yy, xx = np.mgrid[:H, :W]
    r2 = (yy - 60) ** 2 + (xx - 60) ** 2
    ring = ((r2 <= 40 ** 2) & (r2 >= 38 ** 2)).astype(np.uint8)
    disk = (r2 <= 20 ** 2).astype(np.uint8)
    assert ring.sum() < disk.sum()          # raw area: disk wins

    areas = np.asarray(candidate_rank_areas(jnp.asarray(
        np.stack([ring, disk]))))
    assert areas[0] > areas[1]              # filled area: ring wins
    # rank key ≈ true filled area in raw-pixel units (π·40² vs π·20²)
    assert areas[0] > 0.8 * np.pi * 40 ** 2


def test_candidate_rank_does_not_inflate_speckle():
    """The opposite failure mode: scattered threshold-noise pixels whose
    gaps exceed the close kernel must rank near their raw area, not 16×
    (one quarter-res cell each) — otherwise speckle-heavy frames outrank
    the true best frame and push it out of the candidate set."""
    import jax.numpy as jnp

    from att_aspp_unet_tpu.infer.engine import candidate_rank_areas

    H = W = 120
    rng = np.random.default_rng(3)
    speckle = np.zeros((H, W), np.uint8)
    # jittered grid, ≥9-px spacing: the 7×7 close cannot bridge any pair,
    # so the TRUE refined area of this frame is its raw count (then 0 after
    # min-area removal) — exactly the pattern that must not inflate
    for gy in range(4, H - 4, 12):
        for gx in range(4, W - 4, 12):
            speckle[gy + int(rng.integers(-1, 2)),
                    gx + int(rng.integers(-1, 2))] = 1
    yy, xx = np.mgrid[:H, :W]
    disk = (((yy - 60) ** 2 + (xx - 60) ** 2) <= 12 ** 2).astype(np.uint8)
    assert disk.sum() > speckle.sum() * 4   # refined: disk clearly bigger

    areas = np.asarray(candidate_rank_areas(jnp.asarray(
        np.stack([speckle, disk]))))
    assert areas[1] > areas[0]              # disk must out-rank speckle
    # speckle key stays near its raw area, not 16×
    assert areas[0] < 4 * speckle.sum()


def test_candidate_rank_never_under_ranks_refined_area():
    """The candidate cut's safety invariant: key ≥ ~refined area for EVERY
    mask shape, so the reference's refined-area top-k can never lose a
    member to the proxy (over-ranking junk is absorbed by
    ``refine_margin``; under-ranking a true winner would silently change
    the selected frame).  Exercises the pathologies each design iteration
    tripped on: ring interiors (fill gain), connected thin webs whose
    close+fill solidifies them from a small raw count (round-3 review),
    dense disconnected dither (refines to ZERO — min-area CC runs before
    the close), sparse speckle, and a plain blob.  Ground truth is the
    real ``refine_mask``."""
    import jax.numpy as jnp

    from att_aspp_unet_tpu.infer.engine import candidate_rank_areas
    from att_aspp_unet_tpu.postprocess import refine_mask

    H = W = 120
    yy, xx = np.mgrid[:H, :W]
    r2 = (yy - 60) ** 2 + (xx - 60) ** 2

    ring = ((r2 <= 40 ** 2) & (r2 >= 38 ** 2)).astype(np.uint8)
    web = np.zeros((H, W), np.uint8)        # connected 1-px grid, 5-px mesh
    web[20:100:6, 20:100] = 1
    web[20:100, 20:100:6] = 1
    web[99, 20:100] = 1
    web[20:100, 99] = 1
    dither = np.zeros((H, W), np.uint8)     # isolated dots, 3-px gaps
    dither[20:100:4, 20:100:4] = 1
    blob = (r2 <= 25 ** 2).astype(np.uint8)

    stack = np.stack([ring, web, dither, blob])
    refined = np.asarray(refine_mask(jnp.asarray(stack))).sum((-2, -1))
    keys = np.asarray(candidate_rank_areas(jnp.asarray(stack)))

    # the web's refined area is ~3× its raw count (close+fill solidify it)
    assert refined[1] > 2.5 * stack[1].sum()
    # disconnected dither dies in refine (every component < min_area)
    assert refined[2] == 0
    # invariant: no shape's key may fall below ~its refined area
    assert (keys >= 0.9 * refined).all(), (keys, refined)
    # and the two frames with large refined areas out-rank the raw-bigger
    # blob the way refined areas order them
    assert keys[0] > keys[3] and keys[1] > keys[3]
    assert refined[0] > refined[3] and refined[1] > refined[3]


def test_predict_directory_viz_att_panels(tiny_att, tmp_path, rng):
    """--viz_att writes a 2x4 panel per PNG (reference
    test_ablation.py:832-842); with a --weights_noatt companion model the
    second row carries its probabilities instead of zeros."""
    import dataclasses as dc

    cfg, variables = tiny_att
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    img = (rng.random((40, 48)) * 255).astype(np.uint8)
    img[10:30, 10:38] = 250
    write_gray_png(in_dir / "caseV_s1.png", img)

    na_cfg = dc.replace(cfg, model=dc.replace(cfg.model, use_att=False,
                                              att_depth=0))
    na_model = AttentionASPPUNet.from_config(na_cfg.model)
    na_vars = na_model.init(jax.random.PRNGKey(1),
                            np.zeros((1, 64, 64, 1), np.float32),
                            train=False)

    predict_directory(cfg, variables, in_dir, tmp_path / "out",
                      threshold=0.5, viz_att=True, noatt=(na_cfg, na_vars),
                      log=lambda *a: None)
    panel = tmp_path / "out/panels/caseV_s1_panel.png"
    assert panel.exists()
    from att_aspp_unet_tpu.io import read_gray_png as _rd
    from PIL import Image
    arr = np.asarray(Image.open(panel))
    assert arr.shape[0] == 2 * 40 and arr.shape[1] == 4 * 48


def test_engine_psi_sweep_shapes(tiny_att, rng):
    """psi_sweep returns native-resolution maps; gate-free models give
    all-zero maps (the reference zeroes the panel cell, :836)."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 3)
    eng = AttAsppEngine(cfg, variables)
    psi = eng.psi_sweep(sweep)
    assert psi.shape == sweep.shape and psi.dtype == np.float32
    assert np.isfinite(psi).all()
    # ungated model: psis are all None -> zero maps
    na_cfg = dc.replace(cfg, model=dc.replace(cfg.model, use_att=False,
                                              att_depth=0))
    na_model = AttentionASPPUNet.from_config(na_cfg.model)
    na_vars = na_model.init(jax.random.PRNGKey(2),
                            np.zeros((1, 64, 64, 1), np.float32),
                            train=False)
    psi0 = AttAsppEngine(na_cfg, na_vars).psi_sweep(sweep)
    assert np.all(psi0 == 0)


def test_predict_case_cascade_scouts_all_matches_direct(tiny_att, rng):
    """With every frame promoted (scouts >= n) the cascade is the direct
    path with an extra scout pass: frame pick, refined mask and AC must be
    IDENTICAL (the full-res ranking sees the same candidate set)."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 6)
    sweep[3, 8:32, 10:40] = 250          # a dominant blob
    eng_d = AttAsppEngine(cfg, variables)
    f_d, m_d, ac_d = eng_d.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=6))
    eng_c = AttAsppEngine(ccfg, variables)
    f_c, m_c, ac_c = eng_c.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    assert f_c == f_d
    np.testing.assert_array_equal(m_c, m_d)
    np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)


def test_predict_case_cascade_subset_contract(tiny_att, rng):
    """scouts < n: the output contract holds (valid frame, native-res
    mask, finite-or-nan AC).  The refined candidate set is clamped to the
    promote count (never below topk), so a small scout count shrinks the
    refine set rather than inflating promotion (probe r32)."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 8)
    sweep[5, 8:32, 10:40] = 250
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=3))
    eng = AttAsppEngine(ccfg, variables)
    f, m, ac = eng.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    assert 0 <= f < 8
    assert m.shape == sweep.shape[1:]
    assert set(np.unique(m)).issubset({0, 1})
    assert np.isnan(ac) or np.isfinite(ac)


def test_predict_case_cascade_refine_set_clamped_to_promotes(tiny_att, rng):
    """The cascade's refined candidate set is min(topk+refine_margin,
    n_scout) and never below topk: promoting 8 frames must yield exactly
    8 refined candidates even though topk+refine_margin defaults to 16
    (probe r32 — the padded half of a b16 tier-2 micro-batch over 8
    promoted frames was pure waste), and a scout count below topk is
    raised to topk so the exact re-rank keeps its full set."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 24)
    sweep[11, 8:32, 10:40] = 250
    m_direct = cfg.predict.topk_frames + cfg.predict.refine_margin

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=8,
        refine_margin=11))
    eng = AttAsppEngine(ccfg, variables)
    cand_idx, packed, _ = eng.predict_case_submit(sweep, 0.5)
    assert cand_idx.shape[0] == 8 < m_direct
    assert packed.shape[0] == 8

    lcfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=2))
    cand_lo, _, _ = AttAsppEngine(lcfg, variables).predict_case_submit(
        sweep, 0.5)
    assert cand_lo.shape[0] == cfg.predict.topk_frames


def test_predict_bulk_matches_per_sweep_cascade(tiny_att, rng):
    """Bulk cascade over S sweeps == S ``predict_case`` calls EXACTLY:
    promotion and selection are per sweep and every device op is
    per-frame, so amortizing tier 2 and the refine across the group must
    not change any pick, mask, or AC.  Micro-batch shapes are pinned
    equal across both paths (frame_batch = bulk_frame_batch = scout
    batch) so the comparison covers the math, not float-batching noise."""
    import dataclasses as dc

    cfg, variables = tiny_att
    S = 3
    sweeps = np.stack([_sweep(rng, 8) for _ in range(S)])
    sweeps[0, 6, 8:32, 10:40] = 250
    sweeps[2, 1, 5:20, 5:30] = 240
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=4,
        cascade_scout_batch=4, bulk_frame_batch=4))
    eng = AttAsppEngine(ccfg, variables)
    bulk = eng.predict_bulk(sweeps, (0.28, 0.28), threshold=0.5)
    assert len(bulk) == S
    for s in range(S):
        f, m, ac = eng.predict_case(sweeps[s], (0.28, 0.28), threshold=0.5)
        bf, bm, bac = bulk[s]
        assert bf == f
        np.testing.assert_array_equal(bm, m)
        np.testing.assert_allclose(bac, ac, rtol=1e-6, equal_nan=True)


def test_predict_bulk_tiny_sweeps_and_cascade_requirement(tiny_att, rng):
    """Sweeps shorter than topk_frames still satisfy the output contract
    through the bulk path (n_scout and the refined set clamp to n), and
    bulk without cascade mode is a loud error, not a silent slow path."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweeps = np.stack([_sweep(rng, 4), _sweep(rng, 4)])
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=8))
    out = AttAsppEngine(ccfg, variables).predict_bulk(
        sweeps, (0.28, 0.28), threshold=0.5)
    assert len(out) == 2
    for bf, bm, ac in out:
        assert 0 <= bf < 4
        assert bm.shape == sweeps.shape[2:]
        assert np.isnan(ac) or np.isfinite(ac)

    with pytest.raises(ValueError):
        AttAsppEngine(cfg, variables).predict_bulk_submit(sweeps)


def test_predict_case_cascade_lowres_enhance_matches_direct(tiny_att, rng):
    """cascade_lowres_enhance: tier 2 enhances the PROMOTED frames at
    native resolution, and enhancement is per-frame — so with every frame
    promoted the output must still be EXACTLY the direct path even though
    the scout tier saw low-res CLAHE adaptation."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 6)
    sweep[2, 8:32, 10:40] = 250
    eng_d = AttAsppEngine(cfg, variables)
    f_d, m_d, ac_d = eng_d.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=6,
        cascade_lowres_enhance=True))
    eng_c = AttAsppEngine(ccfg, variables)
    f_c, m_c, ac_c = eng_c.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    assert f_c == f_d
    np.testing.assert_array_equal(m_c, m_d)
    np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)


def test_predict_case_cascade_lowres_enhance_subset_contract(tiny_att, rng):
    """scouts < n with low-res scout enhancement: the output contract
    holds and the pick comes from the promoted set (indices valid)."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 8)
    sweep[5, 8:32, 10:40] = 250
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=3,
        cascade_lowres_enhance=True))
    eng = AttAsppEngine(ccfg, variables)
    f, m, ac = eng.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    assert 0 <= f < 8
    assert m.shape == sweep.shape[1:]
    assert set(np.unique(m)).issubset({0, 1})
    assert np.isnan(ac) or np.isfinite(ac)


def test_scout_micro_batch_rule():
    """Padding-aware scout batch: halve until zero-pad ≤ n/4, floor at
    frame_batch; 0 requests the frame_batch."""
    from att_aspp_unet_tpu.infer.engine import scout_micro_batch

    assert scout_micro_batch(840, 128, 16) == 128   # pad 56 ≤ 210
    assert scout_micro_batch(140, 128, 16) == 32    # 128→pad 116, 64→52, 32→20
    assert scout_micro_batch(140, 0, 16) == 16      # 0 = frame_batch
    assert scout_micro_batch(8, 128, 16) == 8       # capped at n
    assert scout_micro_batch(7, 4, 4) == 4          # floor at frame_batch


def test_predict_case_cascade_scout_batch_invariance(tiny_att, rng):
    """cascade_scout_batch is pure micro-batching of the scout forward —
    frames are independent, so any batch gives identical output."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 7)
    sweep[4, 8:32, 10:40] = 250
    outs = []
    for sb in (0, 5):
        ccfg = dc.replace(cfg, predict=dc.replace(
            cfg.predict, cascade=True, cascade_img_size=32,
            cascade_scouts=3, cascade_scout_batch=sb))
        outs.append(AttAsppEngine(ccfg, variables).predict_case(
            sweep, (0.28, 0.28), threshold=0.5))
    (f0, m0, ac0), (f1, m1, ac1) = outs
    assert f0 == f1
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(ac0, ac1, rtol=1e-6, equal_nan=True)


def test_predict_case_cascade_distilled_scout_exactness(tiny_att, rng, tmp_path):
    """A DIFFERENT (random, smaller) scout model with every frame promoted
    must still be EXACTLY the direct path: tier 2 always runs the main
    model, so scout quality can only affect WHICH frames promote — and
    with scouts >= n that set is all of them regardless of the scout."""
    import dataclasses as dc

    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    cfg, variables = tiny_att
    scout_model = AttentionASPPUNet.from_config(dc.replace(
        cfg.model, base_c=2))
    scout_vars = scout_model.init(jax.random.PRNGKey(7),
                                  np.zeros((1, 32, 32, 1), np.float32),
                                  train=False)
    save_npz_variables(scout_vars, tmp_path / "scout.npz")

    sweep = _sweep(rng, 6)
    eng_d = AttAsppEngine(cfg, variables)
    f_d, m_d, ac_d = eng_d.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=6,
        cascade_scout_weights=str(tmp_path / "scout.npz"),
        cascade_scout_base_c=2, cascade_scout_thr=0.31))
    eng_c = AttAsppEngine(ccfg, variables)
    f_c, m_c, ac_c = eng_c.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    assert f_c == f_d
    np.testing.assert_array_equal(m_c, m_d)
    np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)


def test_predict_case_cascade_scout_diets_match_direct(tiny_att, rng):
    """The tier-1 diets (no-CLAHE scout preprocessing + closed-only rank
    key) touch ONLY which frames promote — with every frame promoted the
    output must stay exactly the direct path, individually and combined."""
    import dataclasses as dc

    cfg, variables = tiny_att
    sweep = _sweep(rng, 6)
    sweep[1, 8:32, 10:40] = 250
    eng_d = AttAsppEngine(cfg, variables)
    f_d, m_d, ac_d = eng_d.predict_case(sweep, (0.28, 0.28), threshold=0.5)

    for diet in ({"cascade_scout_clahe": False},
                 {"cascade_scout_rank": "closed"},
                 {"cascade_scout_clahe": False,
                  "cascade_scout_rank": "closed"}):
        ccfg = dc.replace(cfg, predict=dc.replace(
            cfg.predict, cascade=True, cascade_img_size=32,
            cascade_scouts=6, cascade_lowres_enhance=True, **diet))
        f_c, m_c, ac_c = AttAsppEngine(ccfg, variables).predict_case(
            sweep, (0.28, 0.28), threshold=0.5)
        assert f_c == f_d, diet
        np.testing.assert_array_equal(m_c, m_d)
        np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)


def test_scout_clahe_autodetect_from_summary(tiny_att, tmp_path):
    """cascade_scout_clahe=None auto-reads use_clahe from the summary.json
    next to the scout weights (a no-CLAHE scout must never be served CLAHE
    input by default); an explicit value always wins."""
    import dataclasses as dc
    import json as _json

    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    cfg, variables = tiny_att
    scout_model = AttentionASPPUNet.from_config(dc.replace(
        cfg.model, base_c=2))
    scout_vars = scout_model.init(jax.random.PRNGKey(7),
                                  np.zeros((1, 32, 32, 1), np.float32),
                                  train=False)
    save_npz_variables(scout_vars, tmp_path / "weights.npz")

    def eng(**kw):
        ccfg = dc.replace(cfg, predict=dc.replace(
            cfg.predict, cascade=True,
            cascade_scout_weights=str(tmp_path / "weights.npz"),
            cascade_scout_base_c=2, **kw))
        return AttAsppEngine(ccfg, variables)

    assert eng()._scout_clahe is True            # no summary → default
    (tmp_path / "summary.json").write_text(_json.dumps(
        {"use_clahe": False, "base_c": 2}))
    assert eng()._scout_clahe is False           # auto-detected
    assert eng(cascade_scout_clahe=True)._scout_clahe is True   # explicit
    assert eng(cascade_scout_clahe=False)._scout_clahe is False


def test_scout_thr_autodetect_from_thr_json(tiny_att, tmp_path):
    """cascade_scout_thr=0 auto-adopts the scout's calibrated threshold
    from the thr.json (fallback: summary.json) next to the weights — the
    tier-1 rank mask thresholds the SCOUT's probability distribution, and
    every fidelity probe ran with the scout's own calibrated value
    (bench.py loads it explicitly; the engine must match).  The scout tier
    never uses TTA, so best_thr_no_tta wins over best_thr.  An explicit
    config value always overrides."""
    import dataclasses as dc
    import json as _json

    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    cfg, variables = tiny_att
    scout_model = AttentionASPPUNet.from_config(dc.replace(
        cfg.model, base_c=2))
    scout_vars = scout_model.init(jax.random.PRNGKey(7),
                                  np.zeros((1, 32, 32, 1), np.float32),
                                  train=False)
    save_npz_variables(scout_vars, tmp_path / "weights.npz")

    def eng(**kw):
        ccfg = dc.replace(cfg, predict=dc.replace(
            cfg.predict, cascade=True,
            cascade_scout_weights=str(tmp_path / "weights.npz"),
            cascade_scout_base_c=2, **kw))
        return AttAsppEngine(ccfg, variables)

    assert eng()._scout_thr == 0.0               # no sidecar → main thr
    (tmp_path / "summary.json").write_text(_json.dumps(
        {"base_c": 2, "best_thr": 0.41}))
    assert eng()._scout_thr == 0.41              # summary fallback
    (tmp_path / "thr.json").write_text(_json.dumps(
        {"best_thr": 0.5, "best_thr_no_tta": 0.44}))
    assert eng()._scout_thr == 0.44              # thr.json, no-TTA key
    assert eng(cascade_scout_thr=0.31)._scout_thr == 0.31   # explicit wins
    (tmp_path / "thr.json").write_text("not json")
    assert eng()._scout_thr == 0.41              # unreadable → summary
    # SOURCE precedence beats KEY precedence: a thr.json that records
    # only best_thr must win over a summary.json best_thr_no_tta —
    # merging per key would invert the documented "thr.json (fallback:
    # summary.json)" order (advisor r3 finding)
    (tmp_path / "summary.json").write_text(_json.dumps(
        {"base_c": 2, "best_thr_no_tta": 0.41}))
    (tmp_path / "thr.json").write_text(_json.dumps({"best_thr": 0.52}))
    assert eng()._scout_thr == 0.52


def test_noclahe_scout_without_lowres_enhance_raises(tiny_att, rng):
    """A no-CLAHE scout with cascade_lowres_enhance=False is a hard error:
    without low-res enhancement tier 1 shares tier 2's natively
    CLAHE-enhanced frames, so the scout would silently rank input it was
    never trained on (the exact off-distribution failure the summary.json
    auto-adoption exists to prevent)."""
    import dataclasses as dc

    cfg, variables = tiny_att
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=4,
        cascade_scout_clahe=False, cascade_lowres_enhance=False))
    eng = AttAsppEngine(ccfg, variables)
    with pytest.raises(ValueError, match="lowres_enhance"):
        eng.predict_case(_sweep(rng, 6), (0.28, 0.28), threshold=0.5)
    with pytest.raises(ValueError, match="lowres_enhance"):
        eng.predict_bulk_submit(
            np.stack([_sweep(rng, 6)] * 2), threshold=0.5)


def test_scout_img_size_autodetect_from_summary(tiny_att, rng, tmp_path):
    """A scout's summary.json img_size pins the tier-1 resolution: the
    engine adopts it over a conflicting cascade_img_size (a scout must run
    at the resolution it was trained at — NOTES.md r21/r31), and the
    adopted size flows through the real cascade path: with every frame
    promoted the output is still exactly the direct engine's."""
    import dataclasses as dc
    import json as _json

    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    cfg, variables = tiny_att
    scout_model = AttentionASPPUNet.from_config(dc.replace(
        cfg.model, base_c=2))
    scout_vars = scout_model.init(jax.random.PRNGKey(7),
                                  np.zeros((1, 16, 16, 1), np.float32),
                                  train=False)
    save_npz_variables(scout_vars, tmp_path / "weights.npz")
    (tmp_path / "summary.json").write_text(_json.dumps(
        {"img_size": 16, "base_c": 2, "use_clahe": True}))

    sweep = _sweep(rng, 6)
    f_d, m_d, ac_d = AttAsppEngine(cfg, variables).predict_case(
        sweep, (0.28, 0.28), threshold=0.5)

    # conflicting cascade_img_size=32 — the summary's 16 must win
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=6,
        cascade_scout_weights=str(tmp_path / "weights.npz"),
        cascade_scout_base_c=2))
    eng = AttAsppEngine(ccfg, variables)
    assert eng._scout_img_size == 16
    f_c, m_c, ac_c = eng.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    assert f_c == f_d
    np.testing.assert_array_equal(m_c, m_d)
    np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)


def test_scout_base_c_autodetect_from_summary(tiny_att, rng, tmp_path):
    """cascade_scout_base_c=None auto-reads base_c from the summary.json
    next to the scout weights (``cli train --export_npz`` records it), so
    a distilled scout of any width serves without extra flags; an explicit
    value overrides, and no summary falls back to 16.  The auto-adopted
    scout runs the real cascade path: with every frame promoted the output
    is exactly the direct engine's."""
    import dataclasses as dc
    import json as _json

    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    cfg, variables = tiny_att
    scout_model = AttentionASPPUNet.from_config(dc.replace(
        cfg.model, base_c=2))
    scout_vars = scout_model.init(jax.random.PRNGKey(7),
                                  np.zeros((1, 16, 16, 1), np.float32),
                                  train=False)
    save_npz_variables(scout_vars, tmp_path / "weights.npz")
    (tmp_path / "summary.json").write_text(_json.dumps(
        {"img_size": 16, "base_c": 2, "use_clahe": True}))

    sweep = _sweep(rng, 6)
    f_d, m_d, ac_d = AttAsppEngine(cfg, variables).predict_case(
        sweep, (0.28, 0.28), threshold=0.5)

    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_scouts=6,
        cascade_scout_weights=str(tmp_path / "weights.npz")))
    assert ccfg.predict.cascade_scout_base_c is None     # the AUTO default
    eng = AttAsppEngine(ccfg, variables)
    f_c, m_c, ac_c = eng.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    assert f_c == f_d
    np.testing.assert_array_equal(m_c, m_d)
    np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)

    # a wrong explicit width is a hard shape error, never a silent serve
    bad = dc.replace(cfg, predict=dc.replace(
        ccfg.predict, cascade_scout_base_c=4))
    with pytest.raises(Exception):
        AttAsppEngine(bad, variables).predict_case(
            sweep, (0.28, 0.28), threshold=0.5)


def test_candidate_rank_areas_fill_proxy_off_is_closed_area():
    """fill_proxy=False is exactly the closed-area sum: a hollow ring's
    interior counts under the default key but NOT under the closed-only
    key (the close's kernel is smaller than the ring's inner hole)."""
    import jax.numpy as jnp

    from att_aspp_unet_tpu.infer.engine import candidate_rank_areas
    from att_aspp_unet_tpu.postprocess.morphology import (
        binary_closing, structuring_ellipse)

    ring = np.zeros((48, 48), np.uint8)
    ring[8:40, 8:40] = 1
    ring[14:34, 14:34] = 0              # 20-px hole: survives a 7-px close
    blob = np.zeros((48, 48), np.uint8)
    blob[8:40, 8:40] = 1
    stack = jnp.asarray(np.stack([ring, blob]))

    closed_only = np.asarray(candidate_rank_areas(stack, 7,
                                                  fill_proxy=False))
    closed_ref = np.asarray(binary_closing(
        stack, structuring_ellipse(7)).sum(axis=(-2, -1)))
    np.testing.assert_array_equal(closed_only, closed_ref)

    full = np.asarray(candidate_rank_areas(stack, 7))
    assert full[0] > closed_only[0]     # the proxy credits the interior
    assert closed_only[0] < closed_only[1]


def test_enhance_frames_clip0_skips_clahe(rng):
    """clahe_clip <= 0 disables CLAHE: min-max → median-3 only."""
    import jax.numpy as jnp

    from att_aspp_unet_tpu.ops import median3x3, minmax_normalize_u8
    from att_aspp_unet_tpu.preprocess import enhance_frames

    frames = rng.integers(0, 255, (3, 40, 40)).astype(np.float32)
    got = np.asarray(enhance_frames(jnp.asarray(frames), 0.0, (8, 8), 3))
    want = np.asarray(median3x3(minmax_normalize_u8(jnp.asarray(frames))))
    np.testing.assert_array_equal(got, want)


def test_predict_case_cascade_distilled_scout_subset(tiny_att, rng, tmp_path):
    """scouts < n with a distilled scout: output contract holds."""
    import dataclasses as dc

    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    cfg, variables = tiny_att
    scout_model = AttentionASPPUNet.from_config(dc.replace(
        cfg.model, base_c=2))
    scout_vars = scout_model.init(jax.random.PRNGKey(7),
                                  np.zeros((1, 32, 32, 1), np.float32),
                                  train=False)
    save_npz_variables(scout_vars, tmp_path / "scout.npz")

    sweep = _sweep(rng, 8)
    sweep[5, 8:32, 10:40] = 250
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=3,
        cascade_scout_weights=str(tmp_path / "scout.npz"),
        cascade_scout_base_c=2))
    eng = AttAsppEngine(ccfg, variables)
    f, m, ac = eng.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    assert 0 <= f < 8
    assert m.shape == sweep.shape[1:]
    assert set(np.unique(m)).issubset({0, 1})
    assert np.isnan(ac) or np.isfinite(ac)


def test_predict_case_cascade_exactness_property(tiny_att, rng):
    """Property over random content: whenever every frame is promoted the
    cascade must be EXACTLY the direct path — any divergence would mean
    the two tiers disagree on ranking machinery, not just scout error."""
    import dataclasses as dc

    cfg, variables = tiny_att
    ccfg = dc.replace(cfg, predict=dc.replace(
        cfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=7))
    eng_d = AttAsppEngine(cfg, variables)
    eng_c = AttAsppEngine(ccfg, variables)
    for seed in range(6):
        r = np.random.default_rng(seed)
        sweep = (r.random((7, 40, 48)) * 255).astype(np.uint8)
        if seed % 2:
            y, x = 4 + seed, 6 + seed
            sweep[seed % 7, y:y + 20, x:x + 28] = 250
        # one fixed threshold: it is a static jit arg, so varying it would
        # recompile both engines per iteration (~20 s each on this host)
        f_d, m_d, ac_d = eng_d.predict_case(sweep, (0.28, 0.28),
                                            threshold=0.5)
        f_c, m_c, ac_c = eng_c.predict_case(sweep, (0.28, 0.28),
                                            threshold=0.5)
        assert f_c == f_d, f"seed {seed}: {f_c} != {f_d}"
        np.testing.assert_array_equal(m_c, m_d)
        np.testing.assert_allclose(ac_c, ac_d, rtol=1e-6, equal_nan=True)
