"""MetaImage codec round-trip and format-compat tests.

The reference used SimpleITK for .mha IO (``/root/reference/inference.py``);
these tests pin our own codec's behavior: header layout, compression,
dtype coverage, and geometry metadata round-trips.
"""

import numpy as np
import pytest

from att_aspp_unet_tpu.io import MetaImage, read_mha, write_mha


@pytest.mark.parametrize("compressed", [False, True])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16, np.float32])
def test_roundtrip(tmp_path, rng, compressed, dtype):
    arr = (rng.random((5, 12, 7)) * 100).astype(dtype)
    img = MetaImage(arr, spacing=(0.28, 0.28, 0.28), offset=(1.0, 2.0, 3.0))
    p = tmp_path / "x.mha"
    write_mha(p, img, compressed=compressed)
    back = read_mha(p)
    np.testing.assert_array_equal(back.array, arr)
    assert back.array.dtype == np.dtype(dtype)
    assert back.spacing == pytest.approx((0.28, 0.28, 0.28))
    assert back.offset == pytest.approx((1.0, 2.0, 3.0))


def test_dimsize_is_xyz_order(tmp_path):
    # numpy (z=2, y=3, x=4) must serialize as DimSize = 4 3 2 (x fastest).
    arr = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    p = tmp_path / "x.mha"
    write_mha(p, MetaImage(arr), compressed=False)
    header = p.read_bytes().split(b"ElementDataFile")[0].decode()
    assert "DimSize = 4 3 2" in header
    back = read_mha(p)
    assert back.array.shape == (2, 3, 4)
    np.testing.assert_array_equal(back.array, arr)


def test_compressed_size_declared(tmp_path):
    arr = np.zeros((4, 8, 8), np.uint8)
    p = tmp_path / "x.mha"
    write_mha(p, MetaImage(arr), compressed=True)
    header = p.read_bytes().split(b"ElementDataFile")[0].decode()
    assert "CompressedData = True" in header
    assert "CompressedDataSize = " in header
    np.testing.assert_array_equal(read_mha(p).array, arr)


def test_copy_information(tmp_path):
    ref = MetaImage(np.zeros((2, 4, 4), np.uint8), spacing=(0.5, 0.6, 0.7),
                    offset=(9.0, 8.0, 7.0))
    out = MetaImage(np.ones((2, 4, 4), np.uint8))
    out.copy_information(ref)
    p = tmp_path / "o.mha"
    write_mha(p, out)
    back = read_mha(p)
    assert back.spacing == pytest.approx((0.5, 0.6, 0.7))
    assert back.offset == pytest.approx((9.0, 8.0, 7.0))


def test_2d_image(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = tmp_path / "x.mha"
    write_mha(p, MetaImage(arr, spacing=(1.5, 2.5), offset=(0.0, 0.0)))
    back = read_mha(p)
    np.testing.assert_array_equal(back.array, arr)
    assert back.spacing == pytest.approx((1.5, 2.5))


def test_size_property():
    img = MetaImage(np.zeros((140, 562, 744), np.uint8))
    # sitk GetSize() order: (x, y, z)
    assert img.size == (744, 562, 140)
