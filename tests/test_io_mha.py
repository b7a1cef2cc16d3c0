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


# ------------- ITK-shaped fixtures (byte-level, independently authored) ----

def _itk_style_bytes(arr, spacing, compressed=True, extra_keys=()):
    """Hand-assemble .mha bytes in MetaIO/ITK's canonical field order —
    including fields and orderings our own writer does NOT emit — to pin the
    reader against genuinely ITK-shaped files (no ITK in this env; the
    reference repo's .mha fixtures are git-LFS stubs)."""
    import zlib

    raw = arr.tobytes()
    z, d, h, w = arr.shape[0], None, arr.shape[1], arr.shape[2]
    payload = zlib.compress(raw, 6) if compressed else raw
    lines = [
        "ObjectType = Image",
        "NDims = 3",
        "BinaryData = True",
        "BinaryDataByteOrderMSB = False",
    ]
    if compressed:
        lines += ["CompressedData = True",
                  f"CompressedDataSize = {len(payload)}"]
    lines += [
        "TransformMatrix = 1 0 0 0 1 0 0 0 1",
        "Offset = 1.5 -2 0",
        "CenterOfRotation = 0 0 0",
        "AnatomicalOrientation = RAI",
        "ElementSpacing = " + " ".join(str(s) for s in spacing),
        f"DimSize = {w} {h} {z}",
    ]
    lines += list(extra_keys)
    lines += ["ElementType = MET_UCHAR", "ElementDataFile = LOCAL"]
    return ("\n".join(lines) + "\n").encode() + payload


def test_read_itk_shaped_compressed(tmp_path, rng):
    arr = (rng.random((3, 5, 4)) * 255).astype(np.uint8)
    p = tmp_path / "itk_style.mha"
    p.write_bytes(_itk_style_bytes(arr, (0.28, 0.29, 0.3), compressed=True))
    img = read_mha(p)
    np.testing.assert_array_equal(img.array, arr)
    assert img.spacing == pytest.approx((0.28, 0.29, 0.3))
    assert tuple(img.offset[:2]) == pytest.approx((1.5, -2.0))


def test_read_itk_shaped_uncompressed_with_unknown_keys(tmp_path, rng):
    arr = (rng.random((2, 4, 6)) * 255).astype(np.uint8)
    p = tmp_path / "itk_style_raw.mha"
    p.write_bytes(_itk_style_bytes(
        arr, (1.0, 1.0, 1.0), compressed=False,
        extra_keys=("ITK_InputFilterName = MetaImageIO",
                    "Modality = MET_MOD_US")))
    img = read_mha(p)
    np.testing.assert_array_equal(img.array, arr)


def test_roundtrip_through_itk_field_order(tmp_path, rng):
    """Our writer's output re-read after being re-serialised in ITK's field
    order must be voxel-identical (header layout must not matter)."""
    arr = (rng.random((4, 6, 5)) * 255).astype(np.uint8)
    ours = tmp_path / "ours.mha"
    write_mha(ours, MetaImage(arr, spacing=(0.5, 0.5, 0.5)))
    re_read = read_mha(ours)
    theirs = tmp_path / "theirs.mha"
    theirs.write_bytes(_itk_style_bytes(np.asarray(re_read.array),
                                        (0.5, 0.5, 0.5)))
    np.testing.assert_array_equal(read_mha(theirs).array, arr)
