"""ctypes loader/builder for the native data-path kernels (gather.cpp).

Compiles on demand with g++ (no pybind11 in this image; plain C linkage +
ctypes). Falls back silently to the numpy path when no compiler is present —
the numpy implementations remain the behavioral reference and are
parity-tested against this.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_DIR, "gather.cpp")
_LIB = os.path.join(_DIR, "libganlab_gather.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_LIB) and (os.path.getmtime(_LIB)
                                 >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            path = _build()
            if path:
                lib = ctypes.CDLL(path)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                i64p = ctypes.POINTER(ctypes.c_int64)
                lib.ganlab_gather_u8.argtypes = [
                    u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    i64p, ctypes.c_int64, u8p]
                lib.ganlab_gather_u8.restype = None
                lib.ganlab_gather_down_u8.argtypes = [
                    u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int, i64p, ctypes.c_int64, u8p]
                lib.ganlab_gather_down_u8.restype = None
                _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def gather(src: np.ndarray, idx: np.ndarray,
           factor: int = 1) -> np.ndarray | None:
    """Parallel out[b] = (optionally downsampled) src[idx[b]].

    src: (N, H, W, C) uint8 (may be a memmap); idx: int64 (B,).
    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n, h, w, c = src.shape
    assert src.dtype == np.uint8 and h % factor == 0 and w % factor == 0
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    b = idx.shape[0]
    idx_p = idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    if factor == 1:
        out = np.empty((b, h, w, c), np.uint8)
        lib.ganlab_gather_u8(_as_u8p(src), h, w, c, idx_p, b, _as_u8p(out))
    else:
        out = np.empty((b, h // factor, w // factor, c), np.uint8)
        lib.ganlab_gather_down_u8(_as_u8p(src), h, w, c, factor, idx_p, b,
                                  _as_u8p(out))
    return out
