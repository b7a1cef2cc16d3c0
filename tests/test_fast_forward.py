"""Packed inference fast path vs the flax model (CPU, interpret-mode Pallas).

The fast path must be a drop-in for ``model.apply(..., train=False)`` on the
deployment configs: same logits within bf16 tolerance, for both the fused
(W % 128 == 0) and the tap-einsum levels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from att_aspp_unet_tpu.config import ModelConfig
from att_aspp_unet_tpu.infer import fast_forward as ff
from att_aspp_unet_tpu.models import AttentionASPPUNet


def _build(cfg_kw, S, seed=0):
    model = AttentionASPPUNet.from_config(ModelConfig(**cfg_kw))
    rng = jax.random.PRNGKey(seed)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (2, S, S, 1))
    variables = model.init(rng, x, train=False)
    # non-trivial BN stats so the fold is actually exercised
    variables = jax.tree.map(lambda a: a, variables)
    stats = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(
            jax.random.PRNGKey(seed + 2), a.shape) ** 2,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    return model, variables, x


@pytest.mark.parametrize("S,base_c", [(128, 8), (64, 8)])
def test_fast_matches_flax(S, base_c):
    model, variables, x = _build(dict(base_c=base_c), S)
    ref = model.apply(variables, x, train=False)[0]

    plan = ff.pack_variables(model, variables)
    fast = ff.make_fast_apply(model, interpret=True)(plan, x)

    assert fast.shape == ref.shape
    # tight logit tolerance: loose bounds here once masked a flipped
    # up-conv kernel (pack_variables now pre-flips; the bound would
    # admit it again at ~0.03 max err)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=0.012, rtol=0.05)
    # the two paths agree on the actual deliverable: the probability map
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(fast)), np.asarray(jax.nn.sigmoid(ref)),
        atol=3e-3)


def test_fast_no_attention_variant():
    model, variables, x = _build(dict(base_c=8, use_att=False), 64)
    ref = model.apply(variables, x, train=False)[0]
    plan = ff.pack_variables(model, variables)
    fast = ff.make_fast_apply(model, interpret=True)(plan, x)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(fast)), np.asarray(jax.nn.sigmoid(ref)),
        atol=5e-3)


def test_engine_fast_path_matches_flax_path(rng):
    from att_aspp_unet_tpu.config import Config, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    model_kw = dict(base_c=8)
    model, variables, _ = _build(model_kw, 64)
    sweep = (rng.random((6, 48, 56)) * 255).astype(np.uint8)

    def mk(fast):
        cfg = Config(preprocess=PreprocessConfig(img_size=64),
                     model=__import__(
                         "att_aspp_unet_tpu.config", fromlist=["ModelConfig"]
                     ).ModelConfig(**model_kw),
                     predict=PredictConfig(frame_batch=2, tta_hflip=False,
                                           fast_forward=fast))
        return AttAsppEngine(cfg, variables)

    ref_eng = mk(False)
    fast_eng = mk(True)
    assert ref_eng._apply is not fast_eng._apply
    ref = np.asarray(ref_eng.predict_full(sweep))
    got = np.asarray(fast_eng.predict_full(sweep))
    np.testing.assert_allclose(got, ref, atol=6e-3)


def test_unsupported_config_refused():
    model = AttentionASPPUNet.from_config(
        ModelConfig(base_c=8, gate_variant="v2"))
    assert not ff.supports(model)
    with pytest.raises(ValueError):
        ff.pack_variables(model, {"params": {}, "batch_stats": {}})
