"""Width-packed 512² serving stage (`conv_lowering="w2d_stage"`).

Exactness of the packed full-resolution level against the direct model —
same checkpoints (parameter names/shapes are compatible by construction),
same logits up to f32 reassociation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from att_aspp_unet_tpu.config import ModelConfig
from att_aspp_unet_tpu.models import AttentionASPPUNet
from att_aspp_unet_tpu.nn.packed_stage import (PackedConvTranspose2,
                                               packed_pool2)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _mk(base_c=8, **kw):
    return AttentionASPPUNet.from_config(
        ModelConfig(base_c=base_c, compute_dtype="float32", **kw))


def test_packed_transpose_matches_flax(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 6)), jnp.float32)
    ref_mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2),
                               dtype=jnp.float32, param_dtype=jnp.float32)
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(ref_mod.apply(v, x))          # (2, 16, 16, 4)
    pk = PackedConvTranspose2(4, dtype=jnp.float32,
                              param_dtype=jnp.float32)
    got_p = np.asarray(pk.apply(v, x))             # (2, 16, 8, 8) packed
    got = got_p.reshape(2, 16, 8, 2, 4).reshape(2, 16, 16, 4)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_packed_pool_matches_direct(rng):
    x = jnp.asarray(rng.random((2, 8, 10, 4)), jnp.float32)   # unpacked
    xp = x.reshape(2, 8, 5, 8)                                # packed
    direct = np.asarray(nn.max_pool(x, (2, 2), (2, 2)))
    got = np.asarray(packed_pool2(xp))
    np.testing.assert_array_equal(got, direct)


def test_w2d_stage_matches_direct_model(rng):
    direct = _mk()
    packed = _mk(conv_lowering="w2d_stage")
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    variables = direct.init(jax.random.PRNGKey(0), x0, train=False)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)

    ref, psis_r = direct.apply(variables, x, train=False)
    got, psis_g = packed.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert len(psis_g) == len(psis_r)
    for a, b in zip(psis_g, psis_r):
        if a is not None or b is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_w2d_stage_param_shapes_identical(rng):
    """init of the packed model produces the direct model's exact tree."""
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    vd = _mk().init(jax.random.PRNGKey(0), x0, train=False)
    vp = _mk(conv_lowering="w2d_stage").init(jax.random.PRNGKey(0), x0,
                                             train=False)
    sd = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vd)
    sp = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vp)
    assert jax.tree_util.tree_structure(sd) == jax.tree_util.tree_structure(sp)
    assert jax.tree_util.tree_leaves(sd) == jax.tree_util.tree_leaves(sp)


def test_w2d_stage_rejects_train_and_odd_width(rng):
    packed = _mk(conv_lowering="w2d_stage")
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    variables = _mk().init(jax.random.PRNGKey(0), x0, train=False)
    with pytest.raises(ValueError, match="serving"):
        packed.apply(variables, x0, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])
    # odd width is impossible after the even-size preprocess resizes, but
    # the lowering guards it explicitly
    with pytest.raises(ValueError, match="even"):
        packed.apply(variables, np.zeros((1, 64, 63, 1), np.float32),
                     train=False)


def test_engine_w2d_stage_matches_direct(rng):
    import dataclasses

    from att_aspp_unet_tpu.config import (Config, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    base = Config(
        preprocess=PreprocessConfig(img_size=64),
        model=ModelConfig(base_c=8, compute_dtype="float32"),
        predict=PredictConfig(frame_batch=4),
    )
    pcfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model,
                                        conv_lowering="w2d_stage"))
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(3),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((5, 40, 48)) * 200).astype(np.uint8)
    sweep[2, 10:30, 10:38] = 250

    p_d = np.asarray(AttAsppEngine(base, variables).predict_full(sweep))
    p_p = np.asarray(AttAsppEngine(pcfg, variables).predict_full(sweep))
    np.testing.assert_allclose(p_p, p_d, rtol=1e-4, atol=1e-4)


def test_engine_w2d_stage_with_tta(rng):
    import dataclasses

    from att_aspp_unet_tpu.config import (Config, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    base = Config(
        preprocess=PreprocessConfig(img_size=64),
        model=ModelConfig(base_c=8, compute_dtype="float32"),
        predict=PredictConfig(frame_batch=4, tta_hflip=True),
    )
    pcfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model,
                                        conv_lowering="w2d_stage"))
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(4),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((3, 40, 48)) * 200).astype(np.uint8)
    p_d = np.asarray(AttAsppEngine(base, variables).predict_full(sweep))
    p_p = np.asarray(AttAsppEngine(pcfg, variables).predict_full(sweep))
    np.testing.assert_allclose(p_p, p_d, rtol=1e-4, atol=1e-4)
