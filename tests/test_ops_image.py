"""Unit tests: batched XLA image ops vs independent NumPy oracles."""

import numpy as np
import pytest

from att_aspp_unet_tpu.ops import (
    clahe, gaussian_blur, median3x3, minmax_normalize_u8,
    resize_bilinear, resize_nearest, sobel_gradients,
)
from .oracles import (
    clahe_oracle, gaussian5_oracle, median3_oracle, minmax_u8_oracle,
    sobel_oracle,
)


def test_minmax_normalize(rng):
    frames = (rng.random((4, 37, 53)) * 900 - 100).astype(np.float32)
    got = np.asarray(minmax_normalize_u8(frames))
    for i in range(4):
        np.testing.assert_array_equal(got[i], minmax_u8_oracle(frames[i]))


def test_minmax_constant_frame():
    frames = np.full((2, 8, 8), 7, np.float32)
    got = np.asarray(minmax_normalize_u8(frames))
    assert (got == 0).all()


def test_minmax_int16_input(rng):
    frames = (rng.random((2, 20, 20)) * 4000).astype(np.int16)
    got = np.asarray(minmax_normalize_u8(frames))
    for i in range(2):
        np.testing.assert_array_equal(got[i], minmax_u8_oracle(frames[i]))


def test_median3(rng):
    frames = (rng.random((3, 21, 34)) * 255).astype(np.uint8)
    got = np.asarray(median3x3(frames))
    assert got.dtype == np.uint8
    for i in range(3):
        np.testing.assert_array_equal(got[i], median3_oracle(frames[i]))


def test_median3_float(rng):
    frames = rng.random((2, 16, 16)).astype(np.float32)
    got = np.asarray(median3x3(frames))
    for i in range(2):
        np.testing.assert_allclose(got[i], median3_oracle(frames[i]), atol=1e-6)


def _assert_clahe_close(got, want):
    """XLA fuses the bilinear LUT blend into FMAs, which can flip rounding at
    exact .5 boundaries vs the NumPy oracle — allow ±1 on ≤2% of pixels."""
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    frac = (diff != 0).mean()
    assert frac <= 0.02, f"{frac:.3%} of pixels differ"


@pytest.mark.parametrize("grid", [(8, 8), (4, 4)])
def test_clahe_exact_fit(rng, grid):
    # H, W divisible by the grid — no padding path
    frames = (rng.random((1, 48, 48)) * 255).astype(np.uint8)
    got = np.asarray(clahe(frames, 1.0, grid))
    _assert_clahe_close(got[0], clahe_oracle(frames[0], 1.0, grid))


def test_clahe_with_padding(rng):
    # 35×45 over an 8×8 grid → bottom/right REFLECT_101 padding, tiles 5×6
    frames = (rng.random((1, 35, 45)) * 255).astype(np.uint8)
    got = np.asarray(clahe(frames, 1.0, (8, 8)))
    _assert_clahe_close(got[0], clahe_oracle(frames[0], 1.0, (8, 8)))


def test_clahe_higher_clip(rng):
    frames = (rng.random((1, 48, 48)) * 255).astype(np.uint8)
    got = np.asarray(clahe(frames, 4.0, (8, 8)))
    _assert_clahe_close(got[0], clahe_oracle(frames[0], 4.0, (8, 8)))


def test_clahe_interp_impls_agree(rng):
    """The int8 lowering is bit-identical to the bf16 one (exact L−128
    offset trick); the nibble lowering may differ ±1 grey level on rare
    pixels where XLA reassociates its two stacked f32 reductions
    (``ops/clahe.py::_interp_blocks``)."""
    frames = (rng.random((2, 35, 45)) * 255).astype(np.uint8)
    base = np.asarray(clahe(frames, 1.0, (8, 8), impl="onehot_bf16"))
    i8 = np.asarray(clahe(frames, 1.0, (8, 8), impl="onehot_int8"))
    np.testing.assert_array_equal(i8, base)
    nib = np.asarray(clahe(frames, 1.0, (8, 8), impl="nibble"))
    diff = np.abs(nib.astype(int) - base.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() <= 0.02


def test_clahe_structured_image():
    # gradient + noise-free: LUTs should still match the oracle bit-for-bit
    y = np.linspace(0, 255, 64).astype(np.uint8)
    frame = np.tile(y[:, None], (1, 64))
    got = np.asarray(clahe(frame[None], 1.0, (8, 8)))[0]
    np.testing.assert_array_equal(got, clahe_oracle(frame, 1.0, (8, 8)))


def test_gaussian_blur5(rng):
    frames = rng.random((2, 19, 27)).astype(np.float32)
    got = np.asarray(gaussian_blur(frames, 5, 0.0))
    for i in range(2):
        np.testing.assert_allclose(got[i], gaussian5_oracle(frames[i]),
                                   rtol=1e-5, atol=1e-6)


def test_sobel(rng):
    x = rng.random((3, 17, 23)).astype(np.float32)
    gx, gy = sobel_gradients(x)
    for i in range(3):
        ogx, ogy = sobel_oracle(x[i])
        np.testing.assert_allclose(np.asarray(gx)[i], ogx, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy)[i], ogy, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_identity(rng):
    x = rng.random((2, 16, 16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(resize_bilinear(x, (16, 16))), x,
                               rtol=1e-6)


def test_resize_bilinear_upscale_matches_half_pixel():
    # 2× upscale of a linear ramp stays linear in the interior
    x = np.arange(8, dtype=np.float32)[None, None, :].repeat(8, axis=1)
    y = np.asarray(resize_bilinear(x, (8, 16)))[0]
    diffs = np.diff(y[0, 2:-2])
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-5)


def test_resize_nearest_binary_mask(rng):
    m = (rng.random((1, 10, 10)) > 0.5).astype(np.uint8)
    up = np.asarray(resize_nearest(m, (23, 31)))
    assert set(np.unique(up)).issubset({0, 1})
    down = np.asarray(resize_nearest(up, (10, 10)))
    np.testing.assert_array_equal(down, m)
