"""Sliding-window tiled predictor vs a naive per-tile oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.models.sliding_window import (
    compute_tile_starts, gaussian_importance_map, sliding_window_predict)


def test_compute_tile_starts_rules():
    # image == tile → single start
    assert compute_tile_starts(448, 448, 0.5) == [0]
    # image < tile → single start (padding handled by caller)
    assert compute_tile_starts(300, 448, 0.5) == [0]
    # 562 with 448 tiles at 50% → 2 positions covering [0, 114]
    s = compute_tile_starts(562, 448, 0.5)
    assert s[0] == 0 and s[-1] == 562 - 448
    # full coverage, evenly spaced
    s = compute_tile_starts(1000, 448, 0.5)
    assert s[0] == 0 and s[-1] == 552
    assert all(s[i + 1] - s[i] <= 448 for i in range(len(s) - 1))


def test_gaussian_importance_map():
    g = gaussian_importance_map((64, 96))
    assert g.shape == (64, 96)
    assert g.max() == pytest.approx(1.0)
    assert g.min() > 0
    assert g[32, 48] > g[0, 0]
    np.testing.assert_allclose(g, g[::-1], atol=1e-6)


def _linear_apply(variables, x):
    """A fake 'network': channel c = (c+1) · mean3x3-free linear map of the
    input — deterministic, position-dependent, easy to reproduce."""
    w = variables["w"]                    # (C,)
    return x * w[None, None, None, :] + 0.1 * jnp.flip(x, axis=1) * w


def _oracle(frames, w, tile_hw, step, mirroring):
    """NumPy re-implementation of the accumulation rule."""
    N, H, W = frames.shape
    th, tw = tile_hw
    ys = compute_tile_starts(H, th, step)
    xs = compute_tile_starts(W, tw, step)
    g = gaussian_importance_map((th, tw))
    C = len(w)
    acc = np.zeros((N, H, W, C))
    den = np.zeros((H, W))

    def net(x):  # x (th, tw) → (th, tw, C)
        base = x[:, :, None] * w[None, None, :]
        return base + 0.1 * x[::-1, :, None] * w[None, None, :]

    for y0 in ys:
        for x0 in xs:
            for n in range(N):
                tile = frames[n, y0:y0 + th, x0:x0 + tw]
                out = net(tile)
                if mirroring:
                    o = out.copy()
                    o += net(tile[:, ::-1])[:, ::-1]
                    o += net(tile[::-1, :])[::-1, :]
                    o += net(tile[::-1, ::-1])[::-1, ::-1]
                    out = o / 4.0
                acc[n, y0:y0 + th, x0:x0 + tw] += out * g[:, :, None]
            den[y0:y0 + th, x0:x0 + tw] += g
    logits = acc / den[None, :, :, None]
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    return probs.transpose(0, 3, 1, 2)


@pytest.mark.parametrize("mirror_batch", [False, True])
@pytest.mark.parametrize("mirroring", [False, True])
def test_sliding_window_matches_oracle(rng, mirroring, mirror_batch):
    frames = rng.random((2, 40, 56)).astype(np.float32)
    w = np.array([0.5, 1.0, -0.7], np.float32)
    variables = {"w": jnp.asarray(w)}
    got = np.asarray(sliding_window_predict(
        _linear_apply, variables, jnp.asarray(frames), tile_hw=(32, 32),
        step_frac=0.5, use_gaussian=True, use_mirroring=mirroring,
        mirror_batch=mirror_batch))
    want = _oracle(frames, w, (32, 32), 0.5, mirroring)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)


def test_sliding_window_pads_small_frames(rng):
    frames = rng.random((1, 20, 24)).astype(np.float32)
    variables = {"w": jnp.asarray(np.array([1.0, -1.0], np.float32))}
    got = np.asarray(sliding_window_predict(
        _linear_apply, variables, jnp.asarray(frames), tile_hw=(32, 32),
        step_frac=0.5, use_gaussian=True, use_mirroring=False))
    assert got.shape == (1, 2, 20, 24)


def test_plain_unet_shapes():
    from att_aspp_unet_tpu.config import PlainUNetConfig
    from att_aspp_unet_tpu.models import PlainConvUNet

    cfg = PlainUNetConfig(base_c=4, max_c=16, n_stages=4,
                          compute_dtype="float32")
    model = PlainConvUNet.from_config(cfg)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 3)
    # feature widths double then clamp at max_c
    assert model.stage_features(0) == 4
    assert model.stage_features(2) == 16
    assert model.stage_features(3) == 16
