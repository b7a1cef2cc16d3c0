"""Numerical parity: flax models (f32) vs torch oracles with shared weights.

Weights flow through the real checkpoint importer
(``att_aspp_unet_tpu.utils.torch_import``), so these tests pin both the model
math and the .pt-import path used for reference-checkpoint value parity.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.config import ModelConfig
from att_aspp_unet_tpu.models import AttentionASPPUNet
from att_aspp_unet_tpu.utils.torch_import import convert_reference_state_dict

from . import torch_ref

F32 = dict(compute_dtype="float32", param_dtype="float32")


def _to_flax(torch_model, cfg, model, hw=(32, 32)):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw[0], hw[1], cfg.in_channels)),
                           train=False)
    return convert_reference_state_dict(sd, cfg, variables, verbose=False)


def _forward_both(torch_model, cfg, hw=(32, 32), batch=2, seed=0):
    gen = torch.Generator().manual_seed(seed)
    torch_ref.randomize_bn_stats(torch_model, gen)
    torch_model.eval()

    model = AttentionASPPUNet.from_config(cfg)
    variables = _to_flax(torch_model, cfg, model, hw)

    x = torch.rand((batch, cfg.in_channels, hw[0], hw[1]), generator=gen)
    with torch.no_grad():
        t_out = torch_model(x)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    j_out, j_psis = model.apply(variables, x_nhwc, train=False)
    return t_out, j_out, j_psis


def test_v1_full_model_parity():
    cfg = ModelConfig(base_c=8, gate_variant="v1", **F32)
    tm = torch_ref.AttentionASPPUNetV1(base_c=8)
    t_out, j_out, _ = _forward_both(tm, cfg)
    t_np = t_out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(j_out), t_np, rtol=1e-4, atol=1e-4)


def test_v2_full_model_parity():
    cfg = ModelConfig(base_c=8, gate_variant="v2", **F32)
    tm = torch_ref.AttentionASPPUNetV2(base_c=8)
    t_out, j_out, j_psis = _forward_both(tm, cfg)
    t_logits, t_psis = t_out
    np.testing.assert_allclose(np.asarray(j_out),
                               t_logits.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    for tp, jp in zip(t_psis, j_psis):
        assert jp is not None
        np.testing.assert_allclose(np.asarray(jp),
                                   tp.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def test_v2_ablation_no_aspp_no_att():
    cfg = ModelConfig(base_c=8, gate_variant="v2", use_att=False,
                      use_aspp=False, **F32)
    tm = torch_ref.AttentionASPPUNetV2(base_c=8, use_att=False, use_aspp=False)
    t_out, j_out, j_psis = _forward_both(tm, cfg)
    t_logits, _ = t_out
    np.testing.assert_allclose(np.asarray(j_out),
                               t_logits.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    assert all(p is None for p in j_psis)


def test_v2_att_depth_3():
    cfg = ModelConfig(base_c=8, gate_variant="v2", att_depth=3, **F32)
    tm = torch_ref.AttentionASPPUNetV2(base_c=8, att_depth=3)
    t_out, j_out, j_psis = _forward_both(tm, cfg)
    t_logits, t_psis = t_out
    np.testing.assert_allclose(np.asarray(j_out),
                               t_logits.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    assert j_psis[0] is None and j_psis[1] is not None


def test_legacy_key_rename():
    """.W_g. / .W_x. keys (old checkpoints) must import identically."""
    cfg = ModelConfig(base_c=8, gate_variant="v1", **F32)
    tm = torch_ref.AttentionASPPUNetV1(base_c=8)
    gen = torch.Generator().manual_seed(1)
    torch_ref.randomize_bn_stats(tm, gen)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    legacy = {k.replace(".Wg.", ".W_g.").replace(".Wx.", ".W_x."): v
              for k, v in sd.items()}
    model = AttentionASPPUNet.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                           train=False)
    v_new = convert_reference_state_dict(sd, cfg, variables, verbose=False)
    v_leg = convert_reference_state_dict(legacy, cfg, variables, verbose=False)
    jax.tree_util.tree_map(np.testing.assert_array_equal, v_new, v_leg)


def test_state_dict_container_unwrap():
    from att_aspp_unet_tpu.utils.torch_import import normalize_state_dict
    sd = {"state_dict": {"a.W_g.x": np.zeros(1)}}
    out = normalize_state_dict(sd)
    assert list(out) == ["a.Wg.x"]
