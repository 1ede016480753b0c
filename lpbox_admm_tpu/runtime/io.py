"""ctypes bindings for the native C++ IO runtime (native_io.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source); falls back with ImportError so pure-Python callers degrade
gracefully (adapters/ca.py, utils/io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native_io.cpp")
_SO = os.path.join(_HERE, "_native_io.so")
_lock = threading.Lock()
_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.read_coo.restype = ctypes.c_int64
        lib.read_coo.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.read_dense_vec.restype = ctypes.c_int64
        lib.read_dense_vec.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
        ]
        lib.write_xiter.restype = ctypes.c_int
        lib.write_xiter.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        return lib


def read_coo(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rows, cols, vals) 1-indexed triplets from a ``r,c,v`` text file."""
    lib = get_lib()
    empty_i = np.empty(0, np.int64)
    empty_d = np.empty(0, np.float64)
    n = lib.read_coo(path.encode(), empty_i, empty_i, empty_d, 0)
    if n < 0:
        raise IOError(f"cannot read {path}")
    rows = np.empty(n, np.int64)
    cols = np.empty(n, np.int64)
    vals = np.empty(n, np.float64)
    got = lib.read_coo(path.encode(), rows, cols, vals, n)
    assert got == n, (got, n)
    return rows, cols, vals


def read_dense_vec(path: str) -> np.ndarray:
    lib = get_lib()
    empty = np.empty(0, np.float64)
    n = lib.read_dense_vec(path.encode(), empty, 0)
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty(n, np.float64)
    got = lib.read_dense_vec(path.encode(), out, n)
    assert got == n, (got, n)
    return out


def write_xiter(path: str, traj: np.ndarray, start_iter: int = 0):
    lib = get_lib()
    traj = np.ascontiguousarray(traj, dtype=np.float64)
    n, T = traj.shape
    ret = lib.write_xiter(path.encode(), traj, n, T, start_iter)
    if ret != 0:
        raise IOError(f"cannot write {path}")
