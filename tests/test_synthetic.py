"""Synthetic ultrasound generator + compact npz weight archives."""

import numpy as np
import pytest

from att_aspp_unet_tpu.tools.synthetic import (RingTruth, make_dataset,
                                               make_frame, make_sweep)
from att_aspp_unet_tpu.utils.npz_weights import (load_npz_variables,
                                                 save_npz_variables)


def test_make_frame_positive_geometry():
    rng = np.random.default_rng(0)
    img, mask, tr = make_frame(rng, 128, 160, positive=True, quality=1.0)
    assert img.shape == (128, 160) and img.dtype == np.uint8
    assert tr.present and mask.max() == 255
    # mask area ≈ analytic ellipse area
    area = (mask > 0).sum()
    assert area == pytest.approx(np.pi * tr.ry * tr.rx, rel=0.05)
    # Ramanujan-II perimeter of a circle reduces to 2πr
    circ = RingTruth(True, 0, 0, 10.0, 10.0).circumference_px()
    assert circ == pytest.approx(2 * np.pi * 10.0, rel=1e-6)


def test_make_frame_negative_is_maskless():
    rng = np.random.default_rng(1)
    img, mask, tr = make_frame(rng, 96, 96, positive=False)
    assert not tr.present and mask.sum() == 0
    assert img.max() > 0                       # speckle present


def test_make_dataset_shapes_and_balance():
    xs, ys = make_dataset(6, 2, 64, seed=3)
    assert xs.shape == ys.shape == (8, 64, 64)
    pos = (ys.max(axis=(1, 2)) > 0)
    assert pos.sum() == 6 and (~pos).sum() == 2


def test_make_sweep_quality_ramp():
    frames, best, truth = make_sweep(24, 96, 112, seed=4)
    assert frames.shape == (24, 96, 112)
    assert 0 <= best < 24 and truth.present
    assert truth.circumference_px() > 0
    # determinism
    f2, b2, _ = make_sweep(24, 96, 112, seed=4)
    np.testing.assert_array_equal(frames, f2)
    assert b2 == best


def test_npz_variables_roundtrip(tmp_path):
    variables = {
        "params": {"conv": {"kernel": np.random.default_rng(0)
                            .normal(size=(3, 3, 2, 4)).astype(np.float32)},
                   "bn": {"scale": np.ones(4, np.float32)}},
        "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
    }
    p = tmp_path / "w.npz"
    save_npz_variables(variables, p)
    back = load_npz_variables(p)
    assert back["params"]["bn"]["scale"].dtype == np.float32
    np.testing.assert_allclose(back["params"]["conv"]["kernel"],
                               variables["params"]["conv"]["kernel"],
                               atol=1e-3)          # f16 storage
    np.testing.assert_array_equal(back["batch_stats"]["bn"]["mean"],
                                  variables["batch_stats"]["bn"]["mean"])
