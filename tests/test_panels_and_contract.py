"""Ablation panels, env-var contract, and an end-to-end AC value check."""

import dataclasses
import json
import math
import os
from pathlib import Path

import numpy as np
import pytest

import jax

from att_aspp_unet_tpu.evals.panels import (save_attention_panel,
                                            save_topk_candidates,
                                            write_slice_metrics_csv)


def test_attention_panel(tmp_path, rng):
    raw = (rng.random((32, 40)) * 255).astype(np.uint8)
    prob = rng.random((32, 40)).astype(np.float32)
    psi = rng.random((8, 10)).astype(np.float32)    # coarser ψ map
    mask = (prob > 0.5).astype(np.uint8)
    out = save_attention_panel("caseZ", raw, prob, psi, mask, prob, mask,
                               tmp_path)
    assert out.exists()
    from PIL import Image
    with Image.open(out) as im:
        assert im.size == (4 * 40, 2 * 32)


def test_topk_candidates_sheet(tmp_path, rng):
    imgs = (rng.random((6, 32, 32)) * 255).astype(np.uint8)
    probs = rng.random((6, 32, 32)).astype(np.float32)
    masks = np.zeros((6, 32, 32), np.uint8)
    masks[1, 8:24, 8:24] = 1
    masks[4, 10:20, 10:20] = 1
    save_topk_candidates(imgs, probs, masks, [1, 4], best_idx=1,
                         ac_mm=123.4, out_png=tmp_path / "topk.png")
    assert (tmp_path / "topk.png").exists()


def test_slice_metrics_csv(tmp_path):
    masks = np.zeros((3, 24, 24), np.uint8)
    masks[1, 4:20, 4:20] = 1
    write_slice_metrics_csv(masks, tmp_path / "m.csv", "caseQ")
    rows = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert rows[0] == "case_id,slice_idx,area_px,circularity"
    assert rows[2].startswith("caseQ,1,256,")


def test_run_from_env_honours_env(tmp_path, rng, monkeypatch):
    from att_aspp_unet_tpu.config import Config, ContainerConfig, ModelConfig, \
        PredictConfig, PreprocessConfig
    from att_aspp_unet_tpu.infer.container import run_from_env
    from att_aspp_unet_tpu.io import MetaImage, write_mha
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    in_dir = tmp_path / "input/images/stacked-fetal-ultrasound"
    in_dir.mkdir(parents=True)
    sweep = (rng.random((4, 40, 48)) * 200).astype(np.uint8)
    write_mha(in_dir / "c.mha", MetaImage(sweep, spacing=(0.28,) * 3))

    cfg = Config(preprocess=PreprocessConfig(img_size=32),
                 model=ModelConfig(base_c=4, compute_dtype="float32"),
                 predict=PredictConfig(frame_batch=2, roi_size=32,
                                       subsample_frames=4),
                 container=ContainerConfig(input_path=str(tmp_path / "input"),
                                           output_path=str(tmp_path / "out"),
                                           model_tag="baseline",
                                           case_id="default"))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32), train=False)

    monkeypatch.setenv("MODEL_TAG", "att_aspp")
    monkeypatch.setenv("CASE_ID", "envcase")
    rc = run_from_env(cfg, variables, save_probabilities=False,
                      debug_frames=False, log=lambda *a: None)
    assert rc == 0
    # env overrode both the model tag (att_aspp ran fine with att variables)
    # and the output name
    assert (tmp_path / "out/images/fetal-abdomen-segmentation/envcase.mha").exists()


def test_ac_value_through_refine_and_measure(rng):
    """Synthetic ellipse probabilities → refine → measure: the AC must come
    back within a pixel-quantisation tolerance of the analytic value."""
    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.measure import ellipse_circumference
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    cfg = Config(model=ModelConfig(base_c=4, compute_dtype="float32"),
                 predict=PredictConfig(frame_batch=2))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    engine = AttAsppEngine(cfg, variables)

    a, b, sp = 40.0, 26.0, 0.28
    yy, xx = np.mgrid[:160, :160].astype(np.float64)
    d = ((xx - 80) / a) ** 2 + ((yy - 80) / b) ** 2
    probs = np.clip(1.2 - d, 0, 1).astype(np.float32)[None]

    masks = np.asarray(engine.refine(probs, 0.2))
    ac = engine.measure(masks[0], (sp, sp))
    want = float(ellipse_circumference(a * sp, b * sp))
    assert ac == pytest.approx(want, rel=0.04)


def test_dockerfile_copy_sources_exist():
    """Packaging guard: every COPY source in the Dockerfile must exist in
    the build context (round-1 shipped a COPY of a missing resources/)."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    for line in (root / "Dockerfile").read_text().splitlines():
        m = re.match(r"\s*COPY\s+(?:--\S+\s+)*(\S+)\s+\S+\s*$", line)
        if m:
            src = m.group(1)
            assert (root / src).exists(), f"Dockerfile COPY source missing: {src}"


def test_vendored_plans_load():
    """The vendored resources/ plan builds the default baseline config."""
    from pathlib import Path

    from att_aspp_unet_tpu.config import PlainUNetConfig
    from att_aspp_unet_tpu.utils.nnunet_import import load_plans_config

    root = Path(__file__).resolve().parent.parent
    d = (root / "resources/nnUNet_results/Dataset300_ACOptimalSuboptimal/"
         "nnUNetTrainer__nnUNetPlans__2d")
    cfg = load_plans_config(d / "plans.json", dataset_json=d / "dataset.json")
    assert cfg == PlainUNetConfig()
