"""Native (C++) components: build-on-first-use + ctypes bindings.

The reference's native code all arrives via dependencies (SURVEY.md §2.9);
here the runtime-side native pieces are first-class C++ sources compiled
with g++ into shared objects next to this file. pybind11 is unavailable in
this image, so bindings go through ctypes on plain C ABI functions.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent


def _build(name: str, extra_flags=()) -> Path:
    src = _DIR / f"{name}.cpp"
    lib = _DIR / f"lib{name}.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        *extra_flags, str(src), "-o", str(lib),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return lib


_softdtw_lib: Optional[ctypes.CDLL] = None


def softdtw_lib() -> ctypes.CDLL:
    global _softdtw_lib
    if _softdtw_lib is None:
        lib = ctypes.CDLL(str(_build("softdtw")))
        lib.softdtw_forward.restype = ctypes.c_double
        lib.softdtw_forward.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ]
        lib.softdtw_backward.restype = None
        lib.softdtw_backward.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.softdtw_forward_batch.restype = None
        lib.softdtw_forward_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ]
        _softdtw_lib = lib
    return _softdtw_lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def softdtw_cpu(x: np.ndarray, y: np.ndarray, gamma: float = 1.0,
                normalize: bool = False) -> float:
    """Soft-DTW between (N,D) and (M,D) float sequences on the CPU."""
    lib = softdtw_lib()

    def value(a, b):
        D = np.ascontiguousarray(
            ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1), dtype=np.float64
        )
        return lib.softdtw_forward(_ptr(D), D.shape[0], D.shape[1],
                                   ctypes.c_double(gamma), None)

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    v = value(x, y)
    if normalize:
        v -= 0.5 * (value(x, x) + value(y, y))
    return float(v)


def softdtw_grad_cpu(x: np.ndarray, y: np.ndarray, gamma: float = 1.0):
    """Returns (value, dValue/dD) for the pairwise distance matrix."""
    lib = softdtw_lib()
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    D = np.ascontiguousarray(
        ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1), dtype=np.float64
    )
    n, m = D.shape
    R = np.empty((n + 2, m + 2), dtype=np.float64)
    value = lib.softdtw_forward(_ptr(D), n, m, ctypes.c_double(gamma), _ptr(R))
    E = np.empty((n, m), dtype=np.float64)
    lib.softdtw_backward(_ptr(D), _ptr(R), n, m, ctypes.c_double(gamma), _ptr(E))
    return float(value), E
