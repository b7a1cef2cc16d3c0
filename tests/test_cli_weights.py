"""CLI weight loading: orbax checkpoint dirs and torch .pt files."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.cli import load_variables
from att_aspp_unet_tpu.config import Config, ModelConfig, TrainConfig


def _tiny_cfg():
    return Config(model=ModelConfig(base_c=8, compute_dtype="float32"),
                  train=TrainConfig(batch_size=2, epochs=1))


def test_load_variables_orbax_roundtrip(tmp_path):
    from att_aspp_unet_tpu.train.train_loop import (create_train_state,
                                                    save_checkpoint)

    cfg = _tiny_cfg()
    state = create_train_state(cfg.model, cfg.train, steps_per_epoch=1,
                               rng=jax.random.PRNGKey(7), sample_hw=(32, 32))
    save_checkpoint(tmp_path / "best", state)

    variables = load_variables(tmp_path / "best", cfg, img_size=32)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        dict(state.params), dict(variables["params"]))


def test_load_variables_torch_pt(tmp_path):
    from . import torch_ref

    cfg = _tiny_cfg()
    tm = torch_ref.AttentionASPPUNetV1(base_c=8)
    torch.save(tm.state_dict(), tmp_path / "best.pt")
    variables = load_variables(tmp_path / "best.pt", cfg, img_size=32)

    w = tm.state_dict()["out_conv.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(variables["params"]["out_conv"]["kernel"]),
        w.transpose(2, 3, 1, 0), rtol=1e-6)


def test_load_variables_baseline_nnunet(tmp_path):
    """MODEL_TAG=baseline + WEIGHTS: the loader must dispatch to
    PlainConvUNet + the nnU-Net importer, not the att-aspp mapping
    (advisor finding, round 1)."""
    import dataclasses

    from .test_nnunet_import import _NNUNetOracle, _rename
    from att_aspp_unet_tpu.config import PlainUNetConfig

    pu = PlainUNetConfig(base_c=4, max_c=16, n_stages=3, patch_size=(32, 32),
                         compute_dtype="float32")
    cfg = dataclasses.replace(_tiny_cfg(), plain_unet=pu)
    oracle = _NNUNetOracle(pu)
    sd = _rename(dict(oracle.state_dict()))
    torch.save({"network_weights": sd}, tmp_path / "checkpoint_final.pth")

    variables = load_variables(tmp_path / "checkpoint_final.pth", cfg,
                               img_size=32, model_tag="baseline")
    w = sd["encoder.stages.0.0.convs.0.conv.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(variables["params"]["enc0_0"]["conv"]["kernel"]),
        w.transpose(2, 3, 1, 0), rtol=1e-6)
    wd = sd["decoder.stages.0.convs.0.conv.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(variables["params"][f"dec{pu.n_stages - 2}_0"]["conv"]
                   ["kernel"]),
        wd.transpose(2, 3, 1, 0), rtol=1e-6)

    # and the loaded tree applies cleanly to PlainConvUNet
    from att_aspp_unet_tpu.models import PlainConvUNet
    model = PlainConvUNet.from_config(pu)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 1), jnp.float32),
                      train=False)
    assert out.shape == (1, 32, 32, pu.num_classes)
