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


_pitch_lib: Optional[ctypes.CDLL] = None


def pitch_lib() -> ctypes.CDLL:
    global _pitch_lib
    if _pitch_lib is None:
        lib = ctypes.CDLL(str(_build("pitch")))
        lib.dio_f0.restype = ctypes.c_int
        lib.dio_f0.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.stonemask_refine.restype = None
        lib.stonemask_refine.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _pitch_lib = lib
    return _pitch_lib


def dio_pitch(
    wav: np.ndarray,
    sampling_rate: int,
    frame_period_ms: float = None,
    hop_length: int = 256,
    f0_floor: float = 71.0,
    f0_ceil: float = 800.0,
    refine: bool = True,
) -> np.ndarray:
    """DIO-style F0 track + StoneMask-style refinement (native C++ twin of
    the reference's pyworld path, datasets.py:566-575). frame_period
    defaults to the mel hop grid (hop/sr*1000 ms). Returns (n_frames,)
    float64 with 0 = unvoiced."""
    lib = pitch_lib()
    wav = np.ascontiguousarray(wav, dtype=np.float64)
    if frame_period_ms is None:
        frame_period_ms = hop_length / sampling_rate * 1000.0
    n_frames = int(len(wav) / sampling_rate * 1000.0 / frame_period_ms) + 1
    f0 = np.empty(n_frames, dtype=np.float64)
    got = lib.dio_f0(
        _ptr(wav), len(wav), ctypes.c_double(sampling_rate),
        ctypes.c_double(frame_period_ms), ctypes.c_double(f0_floor),
        ctypes.c_double(f0_ceil), _ptr(f0),
    )
    assert got == n_frames
    if refine:
        refined = np.empty_like(f0)
        lib.stonemask_refine(
            _ptr(wav), len(wav), ctypes.c_double(sampling_rate),
            ctypes.c_double(frame_period_ms), _ptr(f0), n_frames,
            _ptr(refined),
        )
        f0 = refined
    return f0


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
