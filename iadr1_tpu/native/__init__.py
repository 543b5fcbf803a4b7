"""ctypes loader for the native data plane (with build-on-demand).

``load()`` returns the shared library handle or None; callers fall back to
the pure-Python implementations (iadr1_tpu/data/packing.py) when the
toolchain or binary is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdataplane.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.POINTER(ctypes.c_int64)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.greedy_knapsack.restype = ctypes.c_int64
    lib.greedy_knapsack.argtypes = [i64, ctypes.c_int64, ctypes.c_int64, i64, i64]
    lib.pack_rows.restype = None
    lib.pack_rows.argtypes = [
        i32, i32, i64, i64, i64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        i32, i32, i32, i32,
    ]
    return lib


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _HERE, "libdataplane.so"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            _lib = _configure(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
        return _lib


def as_i64(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def as_i32(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
