"""Reference-API compatibility facade."""

import numpy as np
import pytest

import jax

from att_aspp_unet_tpu.compat import (FetalAbdomenSegmentation,
                                      select_fetal_abdomen_mask_and_frame)
from att_aspp_unet_tpu.config import (Config, ModelConfig, PlainUNetConfig,
                                      PredictConfig, PreprocessConfig)
from att_aspp_unet_tpu.io import MetaImage, write_mha
from att_aspp_unet_tpu.models import AttentionASPPUNet, PlainConvUNet


def _cfg():
    return Config(preprocess=PreprocessConfig(img_size=32),
                  model=ModelConfig(base_c=4, compute_dtype="float32"),
                  plain_unet=PlainUNetConfig(base_c=4, max_c=16, n_stages=3,
                                             patch_size=(32, 32),
                                             compute_dtype="float32"),
                  predict=PredictConfig(frame_batch=2, roi_size=32,
                                        subsample_frames=4))


def test_att_aspp_facade(tmp_path, rng):
    cfg = _cfg()
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32), train=False)
    sweep = (rng.random((6, 40, 48)) * 200).astype(np.uint8)
    write_mha(tmp_path / "c.mha", MetaImage(sweep, spacing=(0.28,) * 3))

    alg = FetalAbdomenSegmentation(cfg=cfg, variables=variables,
                                   model_tag="att_aspp")
    probs = alg.predict(str(tmp_path / "c.mha"))
    assert probs.shape == (4, 40, 48)          # subsampled frame count
    masks = alg.postprocess(probs)
    sel, frame = select_fetal_abdomen_mask_and_frame(masks)
    assert sel.shape == (40, 48) and -1 <= frame < 4


def test_baseline_facade(tmp_path, rng):
    cfg = _cfg()
    model = PlainConvUNet.from_config(cfg.plain_unet)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32), train=False)
    sweep = (rng.random((3, 40, 48)) * 200).astype(np.uint8)
    write_mha(tmp_path / "c.mha", MetaImage(sweep, spacing=(0.28,) * 3))

    alg = FetalAbdomenSegmentation(cfg=cfg, variables=variables,
                                   model_tag="baseline")
    probs = alg.predict([str(tmp_path / "c.mha")])
    assert probs.shape == (3, 3, 40, 48)
    seg = alg.postprocess(probs)
    sel, frame = select_fetal_abdomen_mask_and_frame(seg)
    assert set(np.unique(sel)).issubset({0, 1})


def test_missing_checkpoint_raises():
    with pytest.raises(FileNotFoundError):
        FetalAbdomenSegmentation(checkpoint_path="/nonexistent/x.pth")


def test_select_binary_2d():
    sel, frame = select_fetal_abdomen_mask_and_frame(np.ones((8, 8), np.uint8))
    assert frame == 0 and sel.sum() == 64


def test_evalutils_validators(tmp_path):
    from att_aspp_unet_tpu.compat import (UniqueImagesValidator,
                                          UniquePathIndicesValidator,
                                          ValidationError)

    a = tmp_path / "case_001.mha"
    b = tmp_path / "case_002.mha"
    a.write_bytes(b"AAA")
    b.write_bytes(b"BBB")
    UniqueImagesValidator()([a, b])
    UniquePathIndicesValidator()([a, b])

    dup = tmp_path / "other_001.mha"
    dup.write_bytes(b"AAA")
    import pytest
    with pytest.raises(ValidationError):
        UniqueImagesValidator()([a, dup])
    with pytest.raises(ValidationError):
        UniquePathIndicesValidator()([a, dup])
