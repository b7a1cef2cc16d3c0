"""int8 post-training-quantized serving path (nn/quant.py, engine wiring).

The mode is a TPU-specific serving optimization with no reference
counterpart (the reference serves f32/AMP convs, ``…stage.py:310``); these
tests pin (a) the quantizer's error bounds, (b) calibrate→serve mechanics
through the flax model, (c) the engine's lazy auto-calibration and the
closeness of int8 probabilities/masks to the bf16 path.  Hardware speed
numbers live in NOTES.md (probes r16-int8/r16b).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                      PreprocessConfig)
from att_aspp_unet_tpu.infer.engine import AttAsppEngine
from att_aspp_unet_tpu.models import AttentionASPPUNet
from att_aspp_unet_tpu.nn.quant import (int8_conv3x3, quantize_act,
                                        quantize_weight)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_quantize_weight_error_bound(rng):
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 9)), jnp.float32)
    q, s = quantize_weight(k)
    assert q.dtype == jnp.int8 and s.shape == (9,)
    # symmetric rounding: |k - q·s| ≤ s/2 per output channel
    err = np.abs(np.asarray(k) - np.asarray(q, np.float32) * np.asarray(s))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_quantize_act_saturates(rng):
    x = jnp.asarray([[-10.0, -1.0, 0.0, 0.26, 127.5]], jnp.float32)
    q = quantize_act(x, jnp.float32(1.0))
    assert np.asarray(q).tolist() == [[-10, -1, 0, 0, 127]]


def test_int8_conv3x3_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    s_x = jnp.float32(float(np.abs(np.asarray(x)).max()) / 127.0)
    y_q = np.asarray(int8_conv3x3(x, k, s_x))

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y_f = np.asarray(jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=dn))
    # error scales with the accumulation length (3·3·8 taps of ±½LSB noise)
    denom = np.abs(y_f).max()
    assert np.abs(y_q - y_f).max() / denom < 0.05
    assert np.corrcoef(y_q.ravel(), y_f.ravel())[0, 1] > 0.999


def _mcfg(**kw):
    return ModelConfig(base_c=8, compute_dtype="float32", **kw)


def test_model_calibrate_then_int8(rng):
    model = AttentionASPPUNet.from_config(_mcfg())
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False)[0])

    calib = model.clone(conv_lowering="int8_calib")
    (cal_out, _), upd = calib.apply(variables, x, train=False,
                                    mutable=["quant"])
    # calibration runs the exact direct conv — identical logits
    np.testing.assert_allclose(np.asarray(cal_out), ref, rtol=0, atol=1e-5)
    scales = jax.tree_util.tree_leaves(upd["quant"])
    assert scales and all(float(s) > 0 for s in scales)

    quant = model.clone(conv_lowering="int8")
    q = np.asarray(quant.apply({**variables, "quant": upd["quant"]},
                               x, train=False)[0])
    spread = ref.std() + 1e-9
    assert np.abs(q - ref).mean() / spread < 0.1
    assert np.corrcoef(q.ravel(), ref.ravel())[0, 1] > 0.98


def test_int8_without_calibration_fails(rng):
    model = AttentionASPPUNet.from_config(_mcfg(conv_lowering="int8"))
    x0 = np.zeros((1, 64, 64, 1), np.float32)
    direct = AttentionASPPUNet.from_config(_mcfg())
    variables = direct.init(jax.random.PRNGKey(0), x0, train=False)
    with pytest.raises(Exception):
        model.apply(variables, x0, train=False)


def _cfgs():
    base = Config(
        preprocess=PreprocessConfig(img_size=64),
        model=_mcfg(),
        predict=PredictConfig(frame_batch=4, quant_calib_frames=4,
                              roi_size=32, subsample_frames=6),
    )
    quant = dataclasses.replace(
        base, model=dataclasses.replace(base.model, conv_lowering="int8"))
    return base, quant


def test_engine_int8_auto_calibrates_and_matches(rng):
    base, qcfg = _cfgs()
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((5, 40, 48)) * 200).astype(np.uint8)
    sweep[2, 10:30, 10:38] = 250

    eng_d = AttAsppEngine(base, variables)
    eng_q = AttAsppEngine(qcfg, variables)
    assert "quant" not in eng_q.variables
    p_d = np.asarray(eng_d.predict_full(sweep))
    p_q = np.asarray(eng_q.predict_full(sweep))
    assert "quant" in eng_q.variables          # lazy calibration happened
    assert np.abs(p_q - p_d).mean() < 0.02
    assert np.abs(p_q - p_d).max() < 0.25

    # full case path runs end-to-end and picks the same frame
    f_d, m_d, _ = eng_d.predict_case(sweep, threshold=0.5)
    f_q, m_q, _ = eng_q.predict_case(sweep, threshold=0.5)
    assert f_q == f_d
    inter = (m_q & m_d).sum()
    union = (m_q | m_d).sum()
    assert union == 0 or inter / union > 0.9


def test_engine_accepts_precalibrated_scales(rng):
    base, qcfg = _cfgs()
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((4, 40, 48)) * 200).astype(np.uint8)

    eng = AttAsppEngine(qcfg, variables)
    eng.predict_full(sweep)
    scales = jax.device_get(eng.variables["quant"])

    eng2 = AttAsppEngine(qcfg, {**variables, "quant": scales})
    assert "quant" in eng2.variables
    p1 = np.asarray(eng.predict_full(sweep))
    p2 = np.asarray(eng2.predict_full(sweep))
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_sharded_int8_matches_unsharded(rng):
    """int8 calibration + serving under a data mesh (replicated scales)."""
    from att_aspp_unet_tpu.config import MeshConfig
    from att_aspp_unet_tpu.parallel.mesh import make_mesh

    cfg = Config(
        preprocess=PreprocessConfig(img_size=32),
        model=ModelConfig(base_c=4, compute_dtype="float32",
                          conv_lowering="int8"),
        predict=PredictConfig(frame_batch=2, quant_calib_frames=4),
    )
    direct = AttentionASPPUNet.from_config(
        dataclasses.replace(cfg.model, conv_lowering="direct"))
    variables = direct.init(jax.random.PRNGKey(0),
                            np.zeros((1, 32, 32, 1), np.float32), train=False)
    sweep = (rng.random((16, 24, 28)) * 255).astype(np.uint8)

    single = AttAsppEngine(cfg, variables)
    ref = np.asarray(single.predict_full(sweep))
    mesh = make_mesh(MeshConfig())
    sharded = AttAsppEngine(cfg, variables, mesh=mesh)
    got = np.asarray(sharded.predict_full(sweep))
    # same evenly-spaced calibration frames → scales agree up to reduction
    # order; probabilities follow
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_prequantized_kernels_bit_identical(rng):
    """Engine-side weight pre-quantization (prequantize_params) must equal
    the in-graph quantization exactly — same round/clip, same scales."""
    from att_aspp_unet_tpu.nn.quant import merge_quant, prequantize_params

    model = AttentionASPPUNet.from_config(_mcfg())
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    x = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    calib = model.clone(conv_lowering="int8_calib")
    _, upd = calib.apply(variables, x, train=False, mutable=["quant"])
    quant = model.clone(conv_lowering="int8")
    y_ingraph = np.asarray(quant.apply(
        {**variables, "quant": upd["quant"]}, x, train=False)[0])

    pq, ws = prequantize_params(variables["params"])
    # every ConvBNReLU conv site got an int8 kernel (d1..d4, u1..u4 ×2)
    n_sites = len(jax.tree_util.tree_leaves(ws))
    assert n_sites == 16
    assert pq["d1_0"]["conv"]["kernel"].dtype == jnp.int8
    qt = merge_quant(jax.device_get(upd["quant"]), jax.device_get(ws))
    y_pre = np.asarray(quant.apply(
        {"params": pq, "batch_stats": variables["batch_stats"],
         "quant": qt}, x, train=False)[0])
    np.testing.assert_array_equal(y_pre, y_ingraph)


def test_quant_scales_npz_roundtrip(rng, tmp_path):
    """Calibrated quant scales persist through the flat-npz archive so a
    deployment reproduces bit-identically without recalibration."""
    from att_aspp_unet_tpu.utils.npz_weights import (load_npz_variables,
                                                     save_npz_variables)

    base, qcfg = _cfgs()
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(2),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((4, 40, 48)) * 200).astype(np.uint8)

    eng = AttAsppEngine(qcfg, variables)
    p1 = np.asarray(eng.predict_full(sweep))
    path = tmp_path / "w.npz"
    save_npz_variables(jax.device_get(eng.variables), path)

    loaded = load_npz_variables(path)
    assert "quant" in loaded
    # scales stored exactly (f32), params narrowed to f16 as before
    want = jax.device_get(eng.variables["quant"])
    got_leaves = jax.tree_util.tree_leaves(loaded["quant"])
    want_leaves = jax.tree_util.tree_leaves(want)
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_array_equal(g, np.asarray(w))

    eng2 = AttAsppEngine(qcfg, loaded)
    assert "quant" in eng2.variables  # no recalibration needed
    p2 = np.asarray(eng2.predict_full(sweep))
    # params are f16-narrowed in the archive → probabilities close, and
    # the quantized path uses the identical scales
    assert np.abs(p1 - p2).max() < 0.02


def test_engine_int8_roi_path(rng):
    """The ROI (container) path also serves through the quantized convs."""
    base, qcfg = _cfgs()
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((9, 40, 48)) * 200).astype(np.uint8)

    eng_d = AttAsppEngine(base, variables)
    eng_q = AttAsppEngine(qcfg, variables)
    p_d = np.asarray(eng_d.predict_roi(sweep))
    p_q = np.asarray(eng_q.predict_roi(sweep))
    assert "quant" in eng_q.variables
    assert p_q.shape == p_d.shape
    assert np.abs(p_q - p_d).mean() < 0.02


def test_cli_int8_flag_reaches_model_config():
    import argparse
    from att_aspp_unet_tpu.cli import _base_config

    ns = argparse.Namespace(int8=True)
    assert _base_config(ns).model.conv_lowering == "int8"
    assert _base_config(argparse.Namespace()).model.conv_lowering == "direct"


def test_int8_composes_with_cascade(rng):
    """int8 lowering + cascade serving compose: auto-calibration fires
    inside the cascade submit, the case path runs end-to-end, and with
    every frame promoted the result matches the int8 DIRECT path."""
    base, qcfg = _cfgs()
    ccfg = dataclasses.replace(qcfg, predict=dataclasses.replace(
        qcfg.predict, cascade=True, cascade_img_size=32, cascade_scouts=6))
    model = AttentionASPPUNet.from_config(base.model)
    variables = model.init(jax.random.PRNGKey(1),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = (rng.random((6, 40, 48)) * 200).astype(np.uint8)
    sweep[3, 10:30, 10:38] = 250

    eng_q = AttAsppEngine(qcfg, variables)
    eng_c = AttAsppEngine(ccfg, variables)
    f_q, m_q, ac_q = eng_q.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    f_c, m_c, ac_c = eng_c.predict_case(sweep, (0.28, 0.28), threshold=0.5)
    assert "quant" in eng_c.variables          # lazy calibration happened
    assert f_c == f_q
    np.testing.assert_array_equal(m_c, m_q)
    np.testing.assert_allclose(ac_c, ac_q, rtol=1e-5, equal_nan=True)
