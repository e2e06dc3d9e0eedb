"""On-demand build + load of the native library."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["hungarian.cpp", "packed_loader.cpp"]
_LIB_NAME = "libclica_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _newest_source_mtime() -> float:
    return max(os.path.getmtime(os.path.join(_HERE, s)) for s in _SOURCES)


def _build() -> Optional[str]:
    out = os.path.join(_HERE, _LIB_NAME)
    if os.path.exists(out) and os.path.getmtime(out) >= _newest_source_mtime():
        return out
    cmd = (
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out]
        + [os.path.join(_HERE, s) for s in _SOURCES]
        + ["-lpthread"]
    )
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return out


def load_native_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) and dlopen the native library; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)

        lib.hungarian_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.hungarian_solve.restype = None

        lib.pl_open.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
        lib.pl_open.restype = ctypes.c_int64
        lib.pl_gather.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pl_gather.restype = ctypes.c_int
        lib.pl_close.argtypes = [ctypes.c_int64]
        lib.pl_close.restype = None

        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native_library() is not None
