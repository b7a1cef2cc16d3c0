"""Predict CLI ablation extras: slice-metrics CSV + top-K candidate sheet."""

import numpy as np
import pytest

import jax

from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                      PreprocessConfig)
from att_aspp_unet_tpu.infer.predict_cli import predict_directory
from att_aspp_unet_tpu.io import MetaImage, write_mha
from att_aspp_unet_tpu.models import AttentionASPPUNet


def test_predict_with_extras(tmp_path, rng):
    cfg = Config(preprocess=PreprocessConfig(img_size=32),
                 model=ModelConfig(base_c=4, compute_dtype="float32"),
                 predict=PredictConfig(frame_batch=2, topk_frames=3))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32), train=False)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    sweep = (rng.random((4, 40, 48)) * 200).astype(np.uint8)
    write_mha(in_dir / "caseC.mha", MetaImage(sweep, spacing=(0.3,) * 3))

    rows = predict_directory(cfg, variables, in_dir, tmp_path / "out",
                             threshold=0.5, slice_metrics=True, topk_viz=True,
                             log=lambda *a: None)
    assert len(rows) == 1
    csv_path = tmp_path / "out/caseC_slices.csv"
    assert csv_path.exists()
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == "case_id,slice_idx,area_px,circularity"
    assert len(lines) == 1 + 4
    assert (tmp_path / "out/caseC_topk.png").exists()
