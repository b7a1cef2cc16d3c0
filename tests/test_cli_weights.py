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
