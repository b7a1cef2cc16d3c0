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


def test_w2d_stage_rejects_odd_width(rng):
    packed = _mk(conv_lowering="w2d_stage")
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    variables = _mk().init(jax.random.PRNGKey(0), x0, train=False)
    # odd width is impossible after the even-size preprocess resizes, but
    # the lowering guards it explicitly
    with pytest.raises(ValueError, match="even"):
        packed.apply(variables, np.zeros((1, 64, 63, 1), np.float32),
                     train=False)


def _train_outputs(model, variables, x, key):
    (logits, _), upd = model.apply(
        variables, x, train=True,
        rngs={"dropout": key}, mutable=["batch_stats"])
    return logits, upd["batch_stats"]


def test_w2d_stage_train_forward_and_stats_match_direct(rng):
    """train=True parity: logits AND the updated BatchNorm running stats
    of the packed 512-level modules equal the direct model's (stats are
    computed in packed space without unpacking — nn/packed_stage.py)."""
    direct = _mk()
    packed = _mk(conv_lowering="w2d_stage")
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    variables = direct.init(jax.random.PRNGKey(0), x0, train=False)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    key = jax.random.PRNGKey(7)

    ld, sd = _train_outputs(direct, variables, x, key)
    lp, sp = _train_outputs(packed, variables, x, key)
    # the packed BN applies the algebraically-identical FOLDED affine
    # (s*x + (bias - mean*s)); different f32 rounding than flax's
    # (x - mean)*inv*scale + bias, amplified across stacked layers
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                               rtol=1e-3, atol=1e-3)

    def flat(tree):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {tuple(str(k) for k in path): np.asarray(v)
                for path, v in leaves}
    fd, fp = flat(sd), flat(sp)
    assert fd.keys() == fp.keys()
    for k in fd:
        # inner (direct-lowered) layers see ~1e-4-different inputs from
        # the packed 512 level's rounding, so their batch stats drift by
        # the same order — tolerance covers propagation, not packing
        np.testing.assert_allclose(fp[k], fd[k], rtol=1e-3, atol=1e-4,
                                   err_msg=str(k))


def test_w2d_stage_train_gradients_match_direct(rng):
    """Autodiff through the packed plan: parameter gradients equal the
    direct model's for a shared scalar loss."""
    direct = _mk()
    packed = _mk(conv_lowering="w2d_stage")
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    variables = direct.init(jax.random.PRNGKey(0), x0, train=False)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    y = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.7), jnp.float32)
    key = jax.random.PRNGKey(3)

    def loss_fn(model):
        def f(params):
            (logits, _), _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            p = jax.nn.sigmoid(logits)
            return jnp.mean((p - y) ** 2)
        return f

    gd = jax.grad(loss_fn(direct))(variables["params"])
    gp = jax.grad(loss_fn(packed))(variables["params"])
    flat_d = jax.tree_util.tree_leaves_with_path(gd)
    flat_p = {tuple(str(k) for k in pth): np.asarray(v)
              for pth, v in jax.tree_util.tree_leaves_with_path(gp)}
    for pth, v in flat_d:
        k = tuple(str(q) for q in pth)
        # f32 smoke bound only: rounding amplifies through the deep
        # backward (worst observed ~9 % of the tiny d1 BN bias leaf's
        # scale, absolute ~2e-4).  The SEMANTIC guarantee is the float64
        # subprocess test below, where both lowerings' gradients agree
        # to ~1e-13.
        d = np.asarray(v)
        err = np.abs(flat_p[k] - d).max()
        scale = np.abs(d).max() + 1e-12
        assert err < max(0.15 * scale, 2e-5), \
            f"{k}: err {err:.3e} scale {scale:.3e}"


def test_w2d_stage_train_gradients_exact_in_float64():
    """Run the gradient comparison under jax_enable_x64 in a subprocess
    (x64 must be set before backend init, so it cannot run in-process):
    at f64 the packed and direct lowerings' gradients agree to ~1e-13,
    proving the f32 deltas above are rounding, not semantics."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import numpy as np
        import jax.numpy as jnp
        from att_aspp_unet_tpu.config import ModelConfig
        from att_aspp_unet_tpu.models import AttentionASPPUNet

        def mk(**kw):
            return AttentionASPPUNet.from_config(ModelConfig(
                base_c=8, compute_dtype="float64",
                param_dtype="float64", **kw))

        direct, packed = mk(), mk(conv_lowering="w2d_stage")
        x0 = np.zeros((1, 64, 64, 1), np.float64)
        variables = direct.init(jax.random.PRNGKey(0), x0, train=False)
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float64)
        y = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.7), jnp.float64)
        key = jax.random.PRNGKey(3)

        def loss_fn(model):
            def f(params):
                (logits, _), _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2)
            return f

        gd = jax.grad(loss_fn(direct))(variables["params"])
        gp = jax.grad(loss_fn(packed))(variables["params"])
        pv = {tuple(str(q) for q in p): np.asarray(v)
              for p, v in jax.tree_util.tree_leaves_with_path(gp)}
        worst = 0.0
        for pth, v in jax.tree_util.tree_leaves_with_path(gd):
            k = tuple(str(q) for q in pth)
            err = float(np.abs(pv[k] - np.asarray(v)).max())
            scale = float(np.abs(np.asarray(v)).max()) + 1e-30
            worst = max(worst, err / scale)
        print("WORST", worst)
        assert worst < 1e-9, worst
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "WORST" in proc.stdout


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


def test_w2d_stage_composes_with_cascade(rng):
    """The two serving opt-ins compose: a cascade engine with the packed
    lowering reproduces the direct engine's predict_case when every frame
    promotes."""
    import dataclasses

    from att_aspp_unet_tpu.config import (Config, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine

    base = Config(
        preprocess=PreprocessConfig(img_size=64),
        model=ModelConfig(base_c=8, compute_dtype="float32"),
        predict=PredictConfig(frame_batch=4),
    )
    combo = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model, conv_lowering="w2d_stage"),
        predict=dataclasses.replace(base.predict, cascade=True,
                                    cascade_img_size=32,
                                    cascade_scouts=5))
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(3),
                           np.zeros((1, 64, 64, 1), np.float32),
                           train=False)
    sweep = (rng.random((5, 40, 48)) * 200).astype(np.uint8)
    sweep[2, 10:30, 10:38] = 250
    f_d, m_d, ac_d = AttAsppEngine(base, variables).predict_case(
        sweep, (0.28, 0.28), threshold=0.5)
    f_c, m_c, ac_c = AttAsppEngine(combo, variables).predict_case(
        sweep, (0.28, 0.28), threshold=0.5)
    assert f_c == f_d
    np.testing.assert_array_equal(m_c, m_d)
    np.testing.assert_allclose(ac_c, ac_d, rtol=1e-5, equal_nan=True)
