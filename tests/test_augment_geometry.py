"""Geometric correctness of the device-side augmentation transforms."""

import dataclasses
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.config import AugmentConfig
from att_aspp_unet_tpu.train.augment import (_inverse_affine, _sample_params,
                                             _warp)


def _centroid(m):
    ys, xs = np.nonzero(m)
    return ys.mean(), xs.mean()


def _apply_affine(img, params, order=1):
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    M = _inverse_affine(params, H, W)
    sx = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
    sy = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
    return np.asarray(_warp(jnp.asarray(img, jnp.float32), sy, sx, order))


def _params(**kw):
    base = {"do_flip": jnp.bool_(False), "do_affine": jnp.bool_(True),
            "scale": jnp.float32(1.0), "angle": jnp.float32(0.0),
            "tx": jnp.float32(0.0), "ty": jnp.float32(0.0)}
    base.update({k: jnp.asarray(v) for k, v in kw.items()})
    return base


def test_identity_affine():
    img = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
    out = _apply_affine(img, _params())
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_hflip():
    img = np.zeros((32, 32), np.float32)
    img[10, 4] = 1.0
    out = _apply_affine(img, _params(do_flip=True))
    assert out[10, 32 - 1 - 4] == pytest.approx(1.0, abs=1e-4)


def test_translation_moves_content():
    img = np.zeros((64, 64), np.float32)
    img[20:28, 20:28] = 1.0
    # translate_percent 0.1 of W=64 → forward shift +6.4 px in x and y
    out = _apply_affine(img, _params(tx=0.1, ty=0.1))
    cy0, cx0 = _centroid(img > 0.5)
    cy1, cx1 = _centroid(out > 0.5)
    assert cx1 - cx0 == pytest.approx(6.4, abs=1.0)
    assert cy1 - cy0 == pytest.approx(6.4, abs=1.0)


def test_rotation_moves_offcenter_point():
    img = np.zeros((65, 65), np.float32)
    img[32, 52] = 1.0                      # 20 px right of center
    a = math.radians(30)
    out = _apply_affine(img, _params(angle=a))
    cy, cx = np.unravel_index(np.argmax(out), out.shape)
    # rotation about the center by +30°
    r = 20.0
    assert abs(abs(cx - 32) - r * math.cos(a)) < 2.0
    assert abs(abs(cy - 32) - r * math.sin(a)) < 2.0


def test_scale_grows_area():
    img = np.zeros((64, 64), np.float32)
    img[24:40, 24:40] = 1.0                # 256 px, centered
    out = _apply_affine(img, _params(scale=1.25))
    area = (out > 0.5).sum()
    assert area == pytest.approx(256 * 1.25 ** 2, rel=0.1)


def test_mask_nearest_preserves_binary():
    img = (np.random.default_rng(0).random((48, 48)) > 0.5).astype(np.float32)
    out = _apply_affine(img, _params(angle=0.2, scale=1.05), order=0)
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_warp_pair_batch_matches_map_coordinates():
    """The fused 4-corner-gather warp (probe r8c, 2.5× faster on v5e) must
    reproduce jax.scipy.ndimage.map_coordinates bit-semantics: order=1 for
    the image, order=0 (round half away from zero, matching jax — see
    augment.py) for the mask, cval=0 borders."""
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.train.augment import _warp_pair_batch

    rng = np.random.default_rng(3)
    B, H, W = 3, 40, 56
    img = rng.random((B, H, W)).astype(np.float32)
    msk = (rng.random((B, H, W)) > 0.6).astype(np.float32) * 255.0
    # coords spanning in-bounds, out-of-bounds, and exact .5 fractions
    sy = (rng.random((B, H, W)) * (H + 8) - 4).astype(np.float32)
    sx = (rng.random((B, H, W)) * (W + 8) - 4).astype(np.float32)
    sy[0, :4] = np.round(sy[0, :4]) + 0.5
    sx[0, :4] = np.round(sx[0, :4]) + 0.5

    got_img, got_msk = jax.jit(_warp_pair_batch)(
        jnp.asarray(img), jnp.asarray(msk), jnp.asarray(sy), jnp.asarray(sx))

    for i in range(B):
        ref_img = jax.scipy.ndimage.map_coordinates(
            img[i], [sy[i], sx[i]], order=1, mode="constant", cval=0.0)
        ref_msk = jax.scipy.ndimage.map_coordinates(
            msk[i], [sy[i], sx[i]], order=0, mode="constant", cval=0.0)
        np.testing.assert_allclose(np.asarray(got_img[i]),
                                   np.asarray(ref_img), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_msk[i]),
                                      np.asarray(ref_msk))


def test_augment_batch_use_clahe_false():
    """AugmentConfig.use_clahe=False drops the deterministic CLAHE from the
    batch tail (median-3 of the raw u8 image only) — the training input of
    a no-CLAHE cascade scout must match its serving preprocessing."""
    from att_aspp_unet_tpu.ops import median3x3
    from att_aspp_unet_tpu.train.augment import augment_batch

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 32, 32)).astype(np.uint8)
    masks = (rng.random((2, 32, 32)) > 0.5).astype(np.uint8) * 255

    x, _ = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                         jnp.asarray(masks),
                         AugmentConfig(use_clahe=False), train=False)
    want = np.asarray(median3x3(jnp.asarray(imgs))).astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(x)[..., 0], want, atol=1e-7)

    x_cl, _ = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs),
                            jnp.asarray(masks),
                            AugmentConfig(use_clahe=True), train=False)
    assert not np.array_equal(np.asarray(x_cl), np.asarray(x))
