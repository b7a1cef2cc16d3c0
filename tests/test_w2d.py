"""Width-to-depth conv lowering (nn/w2d.py): exactness vs the direct
lowering at every level — pure function, flax module, whole models —
plus the trace-time gate.

The lowering claims to be numerically EXACT (same taps, same dtype, f32
MXU accumulation either way; only zero-weight terms are added to the
contraction).  On CPU the accumulation order still differs, so a small
float tolerance is used.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from att_aspp_unet_tpu.nn.w2d import (conv3x3_w2d, resolve_w2d,  # noqa: E402
                                      w2d_pack_weight, w2d_profitable,
                                      w2d_structural)


def _direct(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn)


@pytest.mark.parametrize("shape,co", [
    ((2, 8, 12, 5), 7),      # odd channels, W even
    ((1, 6, 10, 1), 4),      # single input channel (first-layer case)
    ((3, 5, 16, 8), 8),      # odd H is fine; only W must be even
])
def test_conv3x3_w2d_matches_direct(shape, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], co)), jnp.float32)
    np.testing.assert_allclose(np.asarray(conv3x3_w2d(x, w)),
                               np.asarray(_direct(x, w)),
                               rtol=1e-5, atol=1e-5)


def test_pack_weight_structure():
    """Exactly half the packed entries are nonzero, and the total weight
    mass is duplicated once (each original tap appears for q=0 and q=1)."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) + 1.0, jnp.float32)
    w2 = np.asarray(w2d_pack_weight(w))
    assert w2.shape == (3, 3, 8, 12)
    assert (w2 != 0).sum() == 2 * w.size
    assert np.isclose(np.abs(w2).sum(), 2 * np.abs(np.asarray(w)).sum())


def test_gate_logic():
    # structural: 3x3, stride 1, even W only
    assert w2d_structural((1, 8, 12, 4), 3)
    assert not w2d_structural((1, 8, 11, 4), 3)        # odd W
    assert not w2d_structural((1, 8, 12, 4), 5)        # 5x5
    assert not w2d_structural((1, 8, 12, 4), 3, stride=2)
    # profitability: measured win region (probe r15c)
    assert w2d_profitable(48, 48) and w2d_profitable(32, 32)
    assert not w2d_profitable(96, 48)   # packed contraction 192 lanes
    assert not w2d_profitable(64, 64)   # 128 lanes: measured neutral
    assert not w2d_profitable(1, 48)    # bandwidth-bound input conv
    # resolve: 'direct' never; 'w2d' structural-only; 'auto' needs TPU
    assert not resolve_w2d("direct", (1, 8, 12, 48), 3, 48, 48)
    assert resolve_w2d("w2d", (1, 8, 12, 96), 3, 96, 48)
    assert resolve_w2d("auto", (1, 8, 12, 48), 3, 48, 48) == (
        jax.default_backend() == "tpu")


@pytest.mark.parametrize("use_bias", [False, True])
def test_conv3x3_module_lowering_parity(use_bias):
    """The flax Conv3x3 module produces identical outputs (and identical
    param trees) under both lowerings."""
    from att_aspp_unet_tpu.nn.blocks import Conv3x3

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 6)), jnp.float32)
    md = Conv3x3(8, lowering="direct", use_bias=use_bias,
                 dtype=jnp.float32)
    mw = Conv3x3(8, lowering="w2d", use_bias=use_bias, dtype=jnp.float32)
    vs = md.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        md.init(jax.random.PRNGKey(0), x)) == jax.tree_util.tree_structure(
        mw.init(jax.random.PRNGKey(0), x))
    np.testing.assert_allclose(np.asarray(mw.apply(vs, x)),
                               np.asarray(md.apply(vs, x)),
                               rtol=1e-5, atol=1e-5)


def test_flagship_model_lowering_parity():
    """Whole AttentionASPPUNet: forced-w2d output == direct output with
    shared weights (bf16 compute → bf16-scale tolerance)."""
    import dataclasses

    from att_aspp_unet_tpu.config import ModelConfig
    from att_aspp_unet_tpu.models.att_aspp_unet import create_model

    cfg = ModelConfig(base_c=8)
    md, init_d = create_model(dataclasses.replace(
        cfg, conv_lowering="direct"))
    mw, _ = create_model(dataclasses.replace(cfg, conv_lowering="w2d"))
    vs = init_d(jax.random.PRNGKey(0), sample_hw=(32, 48))
    x = jnp.asarray(np.random.default_rng(3).random((2, 32, 48, 1)),
                    jnp.float32)
    yd, _ = md.apply(vs, x, train=False)
    yw, _ = mw.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(yd),
                               rtol=2e-2, atol=2e-2)


def test_baseline_model_lowering_parity():
    """PlainConvUNet (biased convs, InstanceNorm): forced-w2d == direct."""
    import dataclasses

    from att_aspp_unet_tpu.config import PlainUNetConfig
    from att_aspp_unet_tpu.models.plain_unet import PlainConvUNet

    cfg = PlainUNetConfig(base_c=8, n_stages=3, patch_size=(32, 48))
    md = PlainConvUNet.from_config(dataclasses.replace(
        cfg, conv_lowering="direct"))
    mw = PlainConvUNet.from_config(dataclasses.replace(
        cfg, conv_lowering="w2d"))
    x = jnp.asarray(np.random.default_rng(4).random((2, 32, 48, 1)),
                    jnp.float32)
    vs = md.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(mw.apply(vs, x)),
                               np.asarray(md.apply(vs, x)),
                               rtol=2e-2, atol=2e-2)


def test_w2d_grad_flows_to_original_kernel():
    """Training through the packed conv must produce gradients on the
    ORIGINAL (3,3,Ci,Co) kernel — the pack is a linear re-indexing, so
    d/dw of the packed conv equals the direct conv's gradient."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)), jnp.float32)

    g_w2d = jax.grad(lambda w_: jnp.sum(conv3x3_w2d(x, w_) ** 2))(w)
    g_dir = jax.grad(lambda w_: jnp.sum(_direct(x, w_) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g_w2d), np.asarray(g_dir),
                               rtol=1e-4, atol=1e-4)
