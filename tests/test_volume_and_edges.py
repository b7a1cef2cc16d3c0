"""Volume loading formats + pipeline edge cases (all-black sweeps etc.)."""

import dataclasses
import json

import numpy as np
import pytest

import jax

from att_aspp_unet_tpu.io.volume import read_volume
from att_aspp_unet_tpu.io import MetaImage, write_mha


def test_read_volume_mha(tmp_path, rng):
    arr = (rng.random((3, 10, 12)) * 255).astype(np.uint8)
    write_mha(tmp_path / "v.mha", MetaImage(arr, spacing=(0.5, 0.5, 0.5)))
    img = read_volume(tmp_path / "v.mha")
    np.testing.assert_array_equal(img.array, arr)
    assert img.spacing[0] == 0.5


def test_read_volume_tiff(tmp_path, rng):
    from PIL import Image

    frames = [(rng.random((10, 12)) * 255).astype(np.uint8) for _ in range(4)]
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(tmp_path / "v.tiff", save_all=True, append_images=imgs[1:])
    vol = read_volume(tmp_path / "v.tiff")
    assert vol.array.shape == (4, 10, 12)
    np.testing.assert_array_equal(vol.array[2], frames[2])
    assert vol.spacing == (0.28, 0.28, 0.28)


def test_read_volume_unknown_suffix(tmp_path):
    (tmp_path / "v.nii").write_bytes(b"x")
    with pytest.raises(ValueError):
        read_volume(tmp_path / "v.nii")


def test_container_with_tiff_and_black_sweep(tmp_path, rng):
    """A .tiff case of all-black frames must produce the −1/all-zero
    fallback contract, not crash."""
    from PIL import Image

    from att_aspp_unet_tpu.config import (Config, ContainerConfig, ModelConfig,
                                          PredictConfig, PreprocessConfig)
    from att_aspp_unet_tpu.infer.container import run
    from att_aspp_unet_tpu.io import read_mha
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    in_dir = tmp_path / "input/images/stacked-fetal-ultrasound"
    in_dir.mkdir(parents=True)
    black = [Image.fromarray(np.zeros((40, 48), np.uint8)) for _ in range(4)]
    black[0].save(in_dir / "case.tiff", save_all=True, append_images=black[1:])

    cfg = Config(preprocess=PreprocessConfig(img_size=32),
                 model=ModelConfig(base_c=4, compute_dtype="float32"),
                 predict=PredictConfig(frame_batch=2, roi_size=32,
                                       subsample_frames=4),
                 container=ContainerConfig(input_path=str(tmp_path / "input"),
                                           output_path=str(tmp_path / "out"),
                                           model_tag="att_aspp",
                                           case_id="blk"))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32), train=False)
    rc = run(cfg, variables, save_probabilities=False, debug_frames=False,
             log=lambda *a: None)
    assert rc == 0
    frame = json.loads((tmp_path / "out/fetal-abdomen-frame-number.json"
                        ).read_text())
    vol = read_mha(tmp_path / "out/images/fetal-abdomen-segmentation/blk.mha")
    assert vol.array.shape == (4, 40, 48)
    if frame == -1:
        assert vol.array.sum() == 0
    else:
        assert 0 <= frame < 4
