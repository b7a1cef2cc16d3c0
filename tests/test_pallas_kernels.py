"""Pallas kernels (interpret mode on CPU) vs their XLA formulations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.ops.pallas import fused_conv
from att_aspp_unet_tpu.ops.pallas.clahe_interp import (
    clahe_interp_pallas, clahe_interp_pallas_batched)
from att_aspp_unet_tpu.ops.pallas.fused_conv import (
    fold_batchnorm, fused_double_cbr, pack_conv_weight)


def _cbr_oracle(x_nchw, w_hwio, scale, bias):
    """One Conv3x3(pad 1, no bias) + folded-BN + ReLU in NHWC/XLA, with the
    kernel's bf16 input / f32-accumulate precision contract."""
    x = jnp.asarray(x_nchw).astype(jnp.bfloat16).astype(jnp.float32)
    x = jnp.transpose(x, (0, 2, 3, 1))
    w = jnp.asarray(w_hwio).astype(jnp.bfloat16).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y * scale + bias, 0.0)
    return jnp.transpose(y, (0, 3, 1, 2))


@pytest.mark.parametrize("budget", [None, 1])
def test_fused_double_cbr_matches_xla(rng, monkeypatch, budget):
    """Both K-stack paths (full 9-stack and the dy-loop fallback) against a
    two-conv NHWC oracle with the same precision contract."""
    if budget is not None:
        monkeypatch.setattr(fused_conv, "_VMEM_STACK_BUDGET", budget)
    N, cin, cmid, cout, H, W = 2, 5, 7, 6, 16, 128
    x = rng.standard_normal((N, cin, H, W)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, cin, cmid)) * 0.3).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, cmid, cout)) * 0.3).astype(np.float32)
    g1, b1 = rng.random(cmid).astype(np.float32) + 0.5, \
        rng.standard_normal(cmid).astype(np.float32)
    m1, v1 = rng.standard_normal(cmid).astype(np.float32) * 0.1, \
        rng.random(cmid).astype(np.float32) + 0.5
    g2, b2 = rng.random(cout).astype(np.float32) + 0.5, \
        rng.standard_normal(cout).astype(np.float32)
    m2, v2 = rng.standard_normal(cout).astype(np.float32) * 0.1, \
        rng.random(cout).astype(np.float32) + 0.5

    s1, o1 = fold_batchnorm(jnp.asarray(g1), jnp.asarray(b1),
                            jnp.asarray(m1), jnp.asarray(v1))
    s2, o2 = fold_batchnorm(jnp.asarray(g2), jnp.asarray(b2),
                            jnp.asarray(m2), jnp.asarray(v2))

    got = fused_double_cbr(
        jnp.asarray(x), pack_conv_weight(jnp.asarray(w1)), s1, o1,
        pack_conv_weight(jnp.asarray(w2)), s2, o2, interpret=True)

    h = _cbr_oracle(x, w1, s1, o1).astype(jnp.bfloat16)
    want = _cbr_oracle(h, w2, s2, o2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_double_cbr_multiblock_rows(rng):
    """H spanning several row blocks — seams and frame-edge masking."""
    N, cin, cmid, cout, H, W = 1, 3, 4, 2, 128, 128
    monkey_R = fused_conv._row_block(H, W, max(cin, cmid))
    assert H // monkey_R >= 2  # the point of the test: multiple blocks
    x = rng.standard_normal((N, cin, H, W)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, cin, cmid)) * 0.3).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, cmid, cout)) * 0.3).astype(np.float32)
    s1 = jnp.ones(cmid)
    o1 = jnp.full((cmid,), 0.1, jnp.float32)  # nonzero bias exercises masking
    s2, o2 = jnp.ones(cout), jnp.full((cout,), -0.05, jnp.float32)

    got = fused_double_cbr(
        jnp.asarray(x), pack_conv_weight(jnp.asarray(w1)), s1, o1,
        pack_conv_weight(jnp.asarray(w2)), s2, o2, interpret=True)

    h = _cbr_oracle(x, w1, s1, o1).astype(jnp.bfloat16)
    want = _cbr_oracle(h, w2, s2, o2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kernel", [clahe_interp_pallas,
                                    clahe_interp_pallas_batched])
def test_clahe_interp_matches_gather(rng, kernel):
    N, B, P = 2, 6, 64
    blocks = (rng.random((N, B, P)) * 256).astype(np.int32)
    luts = np.sort((rng.random((N, B, 256, 4)) * 255).round(), axis=2
                   ).astype(np.float32)
    wts = rng.random((P, 4)).astype(np.float32)
    wts = wts / wts.sum(axis=1, keepdims=True)

    got = np.asarray(kernel(jnp.asarray(blocks), jnp.asarray(luts),
                            jnp.asarray(wts), interpret=True))

    want = np.zeros((N, B, P), np.float32)
    for n in range(N):
        for b in range(B):
            g = luts[n, b][blocks[n, b]]            # (P, 4)
            want[n, b] = (g * wts).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_clahe_interp_matches_xla(rng):
    N, B, P = 2, 6, 64
    blocks = (rng.random((N, B, P)) * 256).astype(np.int32)
    luts = np.sort((rng.random((N, B, 256, 4)) * 255).round(), axis=2
                   ).astype(np.float32)
    wts = rng.random((P, 4)).astype(np.float32)
    wts = wts / wts.sum(axis=1, keepdims=True)

    got = np.asarray(clahe_interp_pallas(jnp.asarray(blocks),
                                         jnp.asarray(luts), jnp.asarray(wts),
                                         interpret=True))

    # direct gather reference
    want = np.zeros((N, B, P), np.float32)
    for n in range(N):
        for b in range(B):
            g = luts[n, b][blocks[n, b]]            # (P, 4)
            want[n, b] = (g * wts).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_clahe_pallas_path_equals_xla_path(rng):
    """Full clahe() with use_pallas (interpreted via forced flag) ==
    the lax.map one-hot path, bit for bit."""
    from att_aspp_unet_tpu.ops import clahe
    from jax.experimental.pallas import tpu as pltpu

    frames = (rng.random((2, 40, 48)) * 255).astype(np.uint8)
    ref = np.asarray(clahe(frames, 1.0, (8, 8), use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(clahe(frames, 1.0, (8, 8), use_pallas=True))
    np.testing.assert_array_equal(got, ref)
