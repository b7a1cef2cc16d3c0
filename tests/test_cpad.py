"""Channel-padded level-1 lowering (``ModelConfig.c1_pad``, nn/cpad.py).

The pad must be numerically the identity on the real channels — forward,
ψ maps, gradients and BN batch stats — with the padded channels exactly
zero everywhere, and the layout convertible both ways.  Whether it is
FASTER is probe r42's hardware question (VERDICT r4 #1); correctness is
pinned here on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
    PreprocessConfig, TrainConfig
from att_aspp_unet_tpu.models import AttentionASPPUNet
from att_aspp_unet_tpu.nn.cpad import pad_variables_c1, unpad_variables_c1


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


def _mk(base_c=8, **kw):
    return AttentionASPPUNet.from_config(
        ModelConfig(base_c=base_c, compute_dtype="float32", **kw))


@pytest.fixture(scope="module")
def direct_vars():
    model = _mk()
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    return model.init(jax.random.PRNGKey(0), x0, train=False)


@pytest.mark.parametrize("P", [16, 32])
def test_cpad_forward_matches_direct(rng, direct_vars, P):
    direct, padded = _mk(), _mk(c1_pad=P)
    pv = pad_variables_c1(direct_vars, 8, P)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    ref, psis_r = direct.apply(direct_vars, x, train=False)
    got, psis_g = padded.apply(pv, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(psis_g, psis_r):
        if a is not None or b is not None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_cpad_roundtrip_exact(direct_vars):
    pv = pad_variables_c1(direct_vars, 8, 16)
    back = unpad_variables_c1(pv, 8, 16)
    ref_leaves = jax.tree_util.tree_leaves_with_path(direct_vars)
    got = {tuple(str(q) for q in p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(got) == len(ref_leaves)
    for p, v in ref_leaves:
        np.testing.assert_array_equal(got[tuple(str(q) for q in p)],
                                      np.asarray(v))


def test_cpad_padded_channels_stay_zero_through_training(rng, direct_vars):
    """Train-mode forward + gradients: real-channel grads match the
    direct model; every padded weight entry receives EXACTLY zero
    gradient (so AdamW keeps the pad at zero for the whole run and
    unpad stays an exact inverse)."""
    P = 16
    direct, padded = _mk(), _mk(c1_pad=P)
    pv = pad_variables_c1(direct_vars, 8, P)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    y = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.7), jnp.float32)
    key = jax.random.PRNGKey(3)

    def loss_fn(model, variables):
        def f(params):
            (logits, _), upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2), upd
        return f

    (ld, upd_d), gd = jax.value_and_grad(
        lambda p: loss_fn(direct, direct_vars)(p), has_aux=True)(
            direct_vars["params"])
    (lp, upd_p), gp = jax.value_and_grad(
        lambda p: loss_fn(padded, pv)(p), has_aux=True)(pv["params"])
    assert float(lp) == pytest.approx(float(ld), rel=1e-5)

    # padded-entry grads are exactly zero ⇔ unpad(grad) loses nothing
    gp_cut = unpad_variables_c1({"params": gp}, 8, P)["params"]
    re_pad = pad_variables_c1({"params": gp_cut}, 8, P)["params"]
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(re_pad),
            jax.tree_util.tree_leaves_with_path(gp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(p1))
    # and the real-channel grads match the direct model's
    ref = {tuple(str(q) for q in p): np.asarray(v)
           for p, v in jax.tree_util.tree_leaves_with_path(gd)}
    for p, v in jax.tree_util.tree_leaves_with_path(gp_cut):
        k = tuple(str(q) for q in p)
        np.testing.assert_allclose(np.asarray(v), ref[k],
                                   rtol=2e-4, atol=2e-5, err_msg=str(k))
    # BN batch stats on the real channels match too
    sd = {tuple(str(q) for q in p): np.asarray(v) for p, v in
          jax.tree_util.tree_leaves_with_path(upd_d["batch_stats"])}
    sp_cut = unpad_variables_c1(
        {"params": pv["params"], "batch_stats": upd_p["batch_stats"]},
        8, P)["batch_stats"]
    for p, v in jax.tree_util.tree_leaves_with_path(sp_cut):
        k = tuple(str(q) for q in p)
        np.testing.assert_allclose(np.asarray(v), sd[k],
                                   rtol=1e-4, atol=1e-5, err_msg=str(k))


def test_cpad_gradients_exact_in_float64():
    """f64 subprocess (x64 must precede backend init): padded and direct
    gradients agree to ~1e-12 on the real channels — the f32 deltas are
    rounding, not semantics (same pattern as the w2d_stage proof)."""
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
        from att_aspp_unet_tpu.nn.cpad import (pad_variables_c1,
                                               unpad_variables_c1)

        def mk(**kw):
            return AttentionASPPUNet.from_config(ModelConfig(
                base_c=8, compute_dtype="float64",
                param_dtype="float64", **kw))

        direct, padded = mk(), mk(c1_pad=16)
        x0 = np.zeros((1, 64, 64, 1), np.float64)
        variables = direct.init(jax.random.PRNGKey(0), x0, train=False)
        pv = pad_variables_c1(variables, 8, 16)
        rng = np.random.default_rng(17)
        x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float64)
        y = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.7), jnp.float64)
        key = jax.random.PRNGKey(3)

        def loss_fn(model, v):
            def f(params):
                (logits, _), _ = model.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x, train=True, rngs={"dropout": key},
                    mutable=["batch_stats"])
                return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2)
            return f

        gd = jax.grad(loss_fn(direct, variables))(variables["params"])
        gp = jax.grad(loss_fn(padded, pv))(pv["params"])
        gp_cut = unpad_variables_c1({"params": gp}, 8, 16)["params"]
        ref = {tuple(str(q) for q in p): np.asarray(v)
               for p, v in jax.tree_util.tree_leaves_with_path(gd)}
        worst = 0.0
        for pth, v in jax.tree_util.tree_leaves_with_path(gp_cut):
            k = tuple(str(q) for q in pth)
            err = float(np.abs(ref[k] - np.asarray(v)).max())
            scale = float(np.abs(ref[k]).max()) + 1e-30
            worst = max(worst, err / scale)
        print("WORST", worst)
        assert worst < 1e-9, worst
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "WORST" in proc.stdout


def test_engine_cpad_matches_direct(rng, direct_vars):
    """The serving engine under c1_pad: identical frame pick, mask and
    AC on CPU (programs differ only by exact-zero channels)."""
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep

    def cfg(**mkw):
        return Config(preprocess=PreprocessConfig(img_size=64),
                      model=ModelConfig(base_c=8, compute_dtype="float32",
                                        **mkw),
                      predict=PredictConfig(frame_batch=4))

    sweep, _, _ = make_sweep(8, 48, 56, seed=5)
    f0, m0, ac0 = AttAsppEngine(cfg(), direct_vars).predict_case(
        sweep, (1.0, 1.0), threshold=0.5)
    f1, m1, ac1 = AttAsppEngine(cfg(c1_pad=16), direct_vars).predict_case(
        sweep, (1.0, 1.0), threshold=0.5)
    assert int(f1) == int(f0)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    assert ac1 == pytest.approx(ac0, rel=1e-5)


def test_cpad_composes_with_cascade(rng, direct_vars, tmp_path):
    """Cascade serving under c1_pad — including a DISTILLED scout, whose
    own (unpadded) net must never inherit the main model's pad
    (engine._init_scout clears it) — matches the unpadded cascade
    engine exactly on CPU."""
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

    scout = _mk(base_c=4)
    sv = scout.init(jax.random.PRNGKey(2), np.zeros((1, 32, 32, 1),
                                                    np.float32), train=False)
    save_npz_variables(sv, tmp_path / "weights.npz")
    (tmp_path / "summary.json").write_text(
        '{"img_size": 32, "base_c": 4, "use_clahe": true}')

    def cfg(**mkw):
        return Config(preprocess=PreprocessConfig(img_size=64),
                      model=ModelConfig(base_c=8, compute_dtype="float32",
                                        **mkw),
                      predict=PredictConfig(
                          frame_batch=4, cascade=True, cascade_img_size=32,
                          cascade_scouts=4, cascade_scout_batch=4,
                          cascade_scout_weights=str(tmp_path / "weights.npz"),
                          cascade_scout_base_c=4))

    sweep, _, _ = make_sweep(8, 48, 56, seed=9)
    f0, m0, ac0 = AttAsppEngine(cfg(), direct_vars).predict_case(
        sweep, (1.0, 1.0), threshold=0.5)
    eng = AttAsppEngine(cfg(c1_pad=16), direct_vars)
    assert eng._scout_variables["params"]["d1_0"]["conv"][
        "kernel"].shape[-1] == 4          # scout stays unpadded
    f1, m1, ac1 = eng.predict_case(sweep, (1.0, 1.0), threshold=0.5)
    assert int(f1) == int(f0)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m0))
    assert ac1 == pytest.approx(ac0, rel=1e-5)


def test_cpad_create_train_state_inits_zero_padded():
    """create_train_state under c1_pad must produce a tree whose padded
    entries are exactly zero (pad-of-direct-init, not a raw wider init)."""
    from att_aspp_unet_tpu.train.train_loop import create_train_state

    mc = ModelConfig(base_c=8, compute_dtype="float32", c1_pad=16)
    state = create_train_state(mc, TrainConfig(batch_size=2, epochs=1),
                               steps_per_epoch=1,
                               rng=jax.random.PRNGKey(0), sample_hw=(64, 64))
    v = {"params": state.params, "batch_stats": state.batch_stats}
    cut = unpad_variables_c1(v, 8, 16)
    again = pad_variables_c1(cut, 8, 16)
    got = {tuple(str(q) for q in p): np.asarray(x)
           for p, x in jax.tree_util.tree_leaves_with_path(again["params"])}
    for p, x in jax.tree_util.tree_leaves_with_path(v["params"]):
        np.testing.assert_array_equal(
            got[tuple(str(q) for q in p)], np.asarray(x), err_msg=str(p))
    assert state.params["d1_0"]["conv"]["kernel"].shape[-1] == 16


def test_cpad_rejects_bad_configs():
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    with pytest.raises(ValueError, match="c1_pad"):
        _mk(base_c=8, c1_pad=4).init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError, match="direct"):
        _mk(base_c=8, c1_pad=16, conv_lowering="w2d_stage").init(
            jax.random.PRNGKey(0), x, train=False)
    with pytest.raises(ValueError):
        pad_variables_c1({"params": {}}, 8, 4)
