"""ctypes bindings for the native feeder kernels (built on demand with g++;
pybind11 isn't in the image, so the C ABI + ctypes is the binding layer)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "libyolo_native.so"
_LIB = None


def build(force=False) -> Path:
    """Compile the shared library (cached)."""
    src = _HERE / "yolo_native.cpp"
    if _SO.exists() and not force and _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           str(src), "-o", str(_SO), "-ljpeg"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load():
    """Load (building if needed); returns the ctypes lib or raises."""
    global _LIB
    if _LIB is None:
        build()
        lib = ctypes.CDLL(str(_SO))
        lib.decode_letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.pack_s2d_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.native_version.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        return load().native_version() == 1
    except Exception:
        return False


def decode_letterbox_batch(paths, size, scaleup=True):
    """Decode + letterbox a list of JPEG paths natively.

    Returns (images (n, size, size, 3) uint8 RGB, hw0 (n, 2) int32,
    ok (n,) bool). Failed decodes have ok=False (caller should fall back).
    """
    lib = load()
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    hws = np.zeros((n, 2), np.int32)
    oks = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.decode_letterbox_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, int(scaleup),
        hws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        oks.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, hws, oks.astype(bool)


def pack_s2d_u8(images):
    """(n, h, w, c) uint8 contiguous -> (n, h/2, w/2, 4, c) s2d-packed
    (same phase order as models/layers.pack_s2d), at memcpy speed."""
    lib = load()
    n, h, w, c = images.shape
    assert images.dtype == np.uint8 and images.flags.c_contiguous
    out = np.empty((n, h // 2, w // 2, 4, c), np.uint8)
    lib.pack_s2d_u8(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
