"""ctypes bindings for the native C++ acceleration library.

Builds `native/libptnative.so` on demand with make/g++ (no pybind11 in this
environment, so the C ABI + ctypes is the binding layer). Falls back
silently when no toolchain is available — callers check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libptnative.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.ptbvh_build.restype = ctypes.c_int
        lib.ptbvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # tri_bmin
            ctypes.POINTER(ctypes.c_float),  # tri_bmax
            ctypes.c_int,  # num_tris
            ctypes.c_int,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # node_bmin
            ctypes.POINTER(ctypes.c_float),  # node_bmax
            ctypes.POINTER(ctypes.c_int),  # node_first
            ctypes.POINTER(ctypes.c_int),  # node_count
            ctypes.POINTER(ctypes.c_int),  # node_skip
            ctypes.POINTER(ctypes.c_int),  # tri_order
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_sah(tri_bmin: np.ndarray, tri_bmax: np.ndarray,
                  leaf_size: int = 8):
    """Binned-SAH build via the native library. Returns the same tuple
    layout as accel.bvh.FlatBVH (minus the namedtuple) or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    t = tri_bmin.shape[0]
    cap = 2 * t
    bmin = np.ascontiguousarray(tri_bmin, np.float32)
    bmax = np.ascontiguousarray(tri_bmax, np.float32)
    node_bmin = np.empty((cap, 3), np.float32)
    node_bmax = np.empty((cap, 3), np.float32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    node_skip = np.empty(cap, np.int32)
    tri_order = np.empty(t, np.int32)
    f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    n = lib.ptbvh_build(
        f32p(bmin), f32p(bmax), t, leaf_size,
        f32p(node_bmin), f32p(node_bmax),
        i32p(node_first), i32p(node_count), i32p(node_skip), i32p(tri_order),
    )
    if n <= 0:
        return None
    return (
        node_bmin[:n].copy(),
        node_bmax[:n].copy(),
        node_first[:n].copy(),
        node_count[:n].copy(),
        node_skip[:n].copy(),
        tri_order,
    )
