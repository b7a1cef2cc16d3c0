"""ctypes bindings for the native host-ops library (``native/host_ops.cpp``).

The library is built on demand with g++ (cached under ``native/build``); when
no toolchain is available every entry point reports unavailable and callers
fall back to the pure-Python/NumPy paths — the framework never *requires*
the native layer, it only gets faster with it.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libhostops.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ll = ctypes.c_longlong

    lib.ho_inflate.restype = ctypes.c_int
    lib.ho_inflate.argtypes = [u8p, ll, u8p, ll]
    lib.ho_deflate.restype = ll
    lib.ho_deflate.argtypes = [u8p, ll, u8p, ll, ctypes.c_int]
    lib.ho_deflate_bound.restype = ll
    lib.ho_deflate_bound.argtypes = [ll]
    lib.ho_clahe_u8.restype = None
    lib.ho_clahe_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_float, ctypes.c_int, ctypes.c_int, u8p]
    lib.ho_median3_u8.restype = None
    lib.ho_median3_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    lib.ho_label.restype = ctypes.c_int
    lib.ho_label.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.ho_largest_component.restype = ll
    lib.ho_largest_component.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, u8p]
    lib.ho_fill_holes.restype = None
    lib.ho_fill_holes.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    lib.ho_trace_contour.restype = ctypes.c_int
    lib.ho_trace_contour.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p,
                                     ctypes.c_int]
    cs = ctypes.c_char_p
    dbl = ctypes.c_double
    dblp = ctypes.POINTER(ctypes.c_double)
    lib.ho_write_mha_u8.restype = ctypes.c_int
    lib.ho_write_mha_u8.argtypes = [cs, u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, dbl, dbl, dbl, dbl, dbl,
                                    dbl, ctypes.c_int]
    lib.ho_read_mha_dims_u8.restype = ctypes.c_int
    lib.ho_read_mha_dims_u8.argtypes = [cs, i32p, i32p, i32p, dblp, dblp,
                                        dblp]
    lib.ho_read_mha_u8.restype = ctypes.c_int
    lib.ho_read_mha_u8.argtypes = [cs, u8p, ll]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _u8(a: np.ndarray):
    return np.ascontiguousarray(a, np.uint8)


def inflate(blob: bytes, out_len: int) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    src = np.frombuffer(blob, np.uint8)
    dst = np.empty(out_len, np.uint8)
    rc = lib.ho_inflate(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        len(src),
                        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        out_len)
    return dst.tobytes() if rc == 0 else None


def deflate(data: bytes, level: int = 6) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.uint8)
    cap = int(lib.ho_deflate_bound(len(src)))
    dst = np.empty(cap, np.uint8)
    n = lib.ho_deflate(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       len(src),
                       dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       cap, level)
    return dst[:n].tobytes() if n > 0 else None


def clahe_u8(img: np.ndarray, clip: float = 1.0, grid=(8, 8)) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    img = _u8(img)
    out = np.empty_like(img)
    lib.ho_clahe_u8(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    img.shape[0], img.shape[1], clip, grid[0], grid[1],
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def median3_u8(img: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    img = _u8(img)
    out = np.empty_like(img)
    lib.ho_median3_u8(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      img.shape[0], img.shape[1],
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def label(mask: np.ndarray, connectivity: int = 8):
    lib = load()
    if lib is None:
        return None
    m = _u8(mask > 0)
    labels = np.empty(m.shape, np.int32)
    n = lib.ho_label(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     m.shape[0], m.shape[1], connectivity,
                     labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels, int(n)


def largest_component(mask: np.ndarray, connectivity: int = 8):
    lib = load()
    if lib is None:
        return None
    m = _u8(mask > 0)
    out = np.empty_like(m)
    size = lib.ho_largest_component(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], connectivity,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, int(size)


def fill_holes(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    m = _u8(mask > 0)
    out = np.empty_like(m)
    lib.ho_fill_holes(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      m.shape[0], m.shape[1],
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def trace_contour(mask: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    m = _u8(mask > 0)
    max_pts = int(8 * m.sum() + 8)
    buf = np.empty(2 * max(max_pts, 1), np.int32)
    n = lib.ho_trace_contour(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                             m.shape[0], m.shape[1],
                             buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                             max_pts)
    return buf[: 2 * n].reshape(n, 2).copy()


def write_mha_u8(path, vol: np.ndarray, spacing=(1.0, 1.0, 1.0),
                 offset=(0.0, 0.0, 0.0), compressed: bool = True) -> bool:
    """Independent C++ MetaIO writer (``native/metaio_writer.cpp``) — the
    cross-implementation partner of ``io.mha.write_mha``.  ``vol`` is
    (z, y, x) uint8; spacing/offset are (x, y, z) like the Python codec."""
    lib = load()
    if lib is None:
        return False
    vol = _u8(vol)
    nz, ny, nx = vol.shape
    rc = lib.ho_write_mha_u8(
        str(path).encode(), vol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nx, ny, nz, float(spacing[0]), float(spacing[1]), float(spacing[2]),
        float(offset[0]), float(offset[1]), float(offset[2]),
        1 if compressed else 0)
    return rc == 0


def read_mha_u8(path):
    """Independent C++ MetaIO reader: returns ((z, y, x) uint8 array,
    (x, y, z) spacing) or None."""
    lib = load()
    if lib is None:
        return None
    nx = ctypes.c_int32(); ny = ctypes.c_int32(); nz = ctypes.c_int32()
    sx = ctypes.c_double(); sy = ctypes.c_double(); sz = ctypes.c_double()
    rc = lib.ho_read_mha_dims_u8(str(path).encode(),
                                 ctypes.byref(nx), ctypes.byref(ny),
                                 ctypes.byref(nz), ctypes.byref(sx),
                                 ctypes.byref(sy), ctypes.byref(sz))
    if rc != 0:
        return None
    out = np.empty((nz.value, ny.value, nx.value), np.uint8)
    rc = lib.ho_read_mha_u8(str(path).encode(),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            out.size)
    if rc != 0:
        return None
    return out, (sx.value, sy.value, sz.value)
