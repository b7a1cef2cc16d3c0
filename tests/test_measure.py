"""Measurement layer: ellipse fit, contour tracing, AC in mm."""

import math

import numpy as np
import pytest
from scipy import ndimage as ndi

from att_aspp_unet_tpu.measure import (
    arc_length, contour_area, ellipse_circumference, fit_ellipse_mask,
    measure_ac_mm, trace_contour,
)


def _ellipse_mask(shape, cy, cx, a, b, angle_deg=0.0):
    yy, xx = np.mgrid[: shape[0], : shape[1]].astype(np.float64)
    t = math.radians(angle_deg)
    u = (xx - cx) * math.cos(t) + (yy - cy) * math.sin(t)
    v = -(xx - cx) * math.sin(t) + (yy - cy) * math.cos(t)
    return ((u / a) ** 2 + (v / b) ** 2 <= 1.0).astype(np.uint8)


@pytest.mark.parametrize("a,b,angle", [(30, 20, 0), (40, 15, 30), (25, 25, 0),
                                       (35, 22, 75)])
def test_fit_ellipse_axes(a, b, angle):
    m = _ellipse_mask((128, 128), 64, 64, a, b, angle)
    cx, cy, major, minor, valid = (np.asarray(r) for r in
                                   fit_ellipse_mask(m[None]))
    assert bool(valid[0])
    assert abs(cx[0] - 64) < 1.0 and abs(cy[0] - 64) < 1.0
    # boundary pixels sit ~half a pixel outside the continuous ellipse
    assert abs(major[0] / 2 - a) < 1.2
    assert abs(minor[0] / 2 - b) < 1.2


def test_fit_ellipse_batch():
    m1 = _ellipse_mask((64, 64), 32, 32, 20, 12)
    m2 = np.zeros((64, 64), np.uint8)
    out = fit_ellipse_mask(np.stack([m1, m2]))
    valid = np.asarray(out[4])
    assert bool(valid[0]) and not bool(valid[1])


@pytest.mark.parametrize("a,b,angle", [(30, 20, 0), (40, 15, 30), (25, 25, 0),
                                       (35, 22, 75)])
def test_fit_ellipse_host_matches_device(a, b, angle):
    """The numpy host fit (serving collect tail, ``_fit_ellipse_np``) agrees
    with the jitted device fit on the same boundary-pixel set — same
    Halir–Flusser formulation, f64 host vs f32 device."""
    from att_aspp_unet_tpu.measure.ellipse import _fit_ellipse_np

    m = _ellipse_mask((128, 128), 64, 64, a, b, angle)
    dev = [float(np.asarray(r)[0]) for r in fit_ellipse_mask(m[None])[:4]]
    hcx, hcy, hmaj, hmin, hvalid = _fit_ellipse_np(m)
    assert hvalid
    np.testing.assert_allclose([hcx, hcy, hmaj, hmin], dev,
                               rtol=5e-3, atol=5e-2)


def test_fit_ellipse_host_degenerate():
    from att_aspp_unet_tpu.measure.ellipse import _fit_ellipse_np

    assert _fit_ellipse_np(np.zeros((16, 16), np.uint8))[4] is False
    line = np.zeros((16, 16), np.uint8)
    line[8, 2:14] = 1            # collinear points: no ellipse solution
    assert not _fit_ellipse_np(line)[4]


def test_ellipse_circumference_known():
    # circle: C = 2πr
    c = float(ellipse_circumference(10.0, 10.0))
    assert abs(c - 2 * math.pi * 10) < 1e-4
    # strongly eccentric: compare vs numerical integral
    a, b = 30.0, 10.0
    th = np.linspace(0, 2 * np.pi, 200001)
    exact = np.trapezoid(np.sqrt((a * np.sin(th)) ** 2 + (b * np.cos(th)) ** 2), th)
    approx = float(ellipse_circumference(a, b))
    assert abs(approx - exact) / exact < 1e-4


def test_trace_contour_square():
    m = np.zeros((16, 16), np.uint8)
    m[4:9, 4:9] = 1            # 5×5 square → 16 border pixels
    c = trace_contour(m)
    assert len(c) == 16
    assert abs(arc_length(c) - 16.0) < 1e-9
    assert abs(contour_area(c) - 16.0) < 1e-9  # shoelace of the 4×4 ring


def test_trace_contour_disk_perimeter():
    yy, xx = np.mgrid[:64, :64]
    m = (((yy - 32) ** 2 + (xx - 32) ** 2) <= 20 ** 2).astype(np.uint8)
    c = trace_contour(m)
    p = arc_length(c)
    assert abs(p - 2 * np.pi * 20) / (2 * np.pi * 20) < 0.05


def test_trace_contour_single_pixel():
    m = np.zeros((8, 8), np.uint8)
    m[3, 4] = 1
    c = trace_contour(m)
    assert len(c) == 1
    assert arc_length(c) == 0.0


def test_trace_contour_empty():
    assert trace_contour(np.zeros((5, 5), np.uint8)).shape == (0, 2)


def test_measure_ac_ellipse():
    a, b, sp = 40, 25, 0.28
    m = _ellipse_mask((160, 160), 80, 80, a, b, 20)
    got = measure_ac_mm(m, (sp, sp))
    # continuous Ramanujan-II circumference of (a+0.5, b+0.5) semi-axes in mm
    want = float(ellipse_circumference(a * sp, b * sp))
    assert abs(got - want) / want < 0.03


def test_measure_ac_empty():
    assert measure_ac_mm(np.zeros((32, 32), np.uint8), (0.28, 0.28)) == 0.0


def test_measure_ac_tiny_fallback():
    m = np.zeros((32, 32), np.uint8)
    m[10, 10:12] = 1           # 2 px → <5 boundary points → arc-length path
    got = measure_ac_mm(m, (0.5, 0.5))
    assert got >= 0.0 and got < 5.0
