"""Continuous wavelet transform of prosody signals, pure JAX.

The reference decomposes log-pitch into a 10-scale Ricker ("Mexican hat")
CWT spectrogram plus mean/std, and recomposes by summing scales and
re-normalizing (reference ``litfass/dataset/cwt.py``, after Suni et al.
SSW8 2.3). Scale widths are ``2**(i+1) * tau`` for i=1..10 with
tau=0.2833425, and each scale row is weighted by ``(i + 2.5)**(-5/2)``.

scipy.signal.cwt semantics reproduced exactly: each scale convolves the
signal with ``ricker(min(10*width, len(signal)), width)`` in 'same' mode.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

N_SCALES = 10
TAU = 0.2833425


def ricker(points: int, a: float) -> np.ndarray:
    """Ricker wavelet, identical to scipy.signal.ricker."""
    A = 2 / (np.sqrt(3 * a) * np.pi**0.25)
    vec = np.arange(0, points) - (points - 1.0) / 2
    xsq = vec**2
    mod = 1 - xsq / a**2
    gauss = np.exp(-xsq / (2 * a**2))
    return (A * mod * gauss).astype(np.float64)


def scale_widths(n_scales: int = N_SCALES, tau: float = TAU):
    return [2 ** (i + 1) * tau for i in range(1, n_scales + 1)]


def scale_constants(n_scales: int = N_SCALES) -> np.ndarray:
    return np.array([(i + 2.5) ** (-5 / 2) for i in range(1, n_scales + 1)])


def _convolve_same(signal: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """np.convolve(signal, kernel, mode='same') in JAX (full correlation of
    signal with reversed kernel, center-cropped)."""
    n, m = signal.shape[0], kernel.shape[0]
    full = jnp.convolve(signal, kernel, mode="full")
    start = (m - 1) // 2
    return jax.lax.dynamic_slice(full, (start,), (n,))


def decompose_fixed_length(
    signal: jnp.ndarray, n_scales: int = N_SCALES, tau: float = TAU
) -> jnp.ndarray:
    """CWT spectrogram (T, n_scales) for a signal of static length T.

    Wavelet lengths depend on ``min(10*width, T)``, which is static per
    length bucket, so this jits cleanly.
    """
    T = signal.shape[0]
    consts = scale_constants(n_scales)
    rows = []
    for width, c in zip(scale_widths(n_scales, tau), consts):
        points = int(min(10 * width, T))
        wav = jnp.asarray(ricker(points, width), dtype=signal.dtype)
        rows.append(_convolve_same(signal, wav) * c)
    return jnp.stack(rows, axis=-1)  # (T, n_scales)


def decompose(signal: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Full decomposition matching ``CWT.decompose`` (cwt.py:30-46):
    zeros -> 1e-7, log, z-normalize (std + 1e-7), CWT; returns the log
    signal, spectrogram (T, 10), and the log-signal mean/std."""
    signal = jnp.where(signal == 0, 1e-7, signal)
    log_sig = jnp.log(signal)
    mean = jnp.mean(log_sig)
    std = jnp.std(log_sig)
    normed = (log_sig - mean) / (std + 1e-7)
    spec = decompose_fixed_length(normed)
    return {
        "signal": log_sig,
        "spectrogram": spec,
        "mean": mean,
        "std": std,
    }


def decompose_padded(
    signal: jnp.ndarray,
    length: jnp.ndarray,
    n_scales: int = N_SCALES,
    tau: float = TAU,
) -> Dict[str, jnp.ndarray]:
    """:func:`decompose_np` semantics for a zero-padded signal of static
    length T whose true length is the traced scalar ``length``.

    This is what makes CWT variances computable inside a jitted train step
    (reference computes them in CPU DataLoader workers,
    ``litfass/dataset/datasets.py:641-648`` + ``cwt.py:24-46``): the
    mean/std are masked to the true region, the per-scale ricker kernel of
    dynamic length ``points = int(min(10*width, length))`` (scipy.signal.cwt
    truncation) is materialized inside a static buffer, and the
    'same'-mode center crop becomes a traced ``dynamic_slice``. Entries at
    ``t >= length`` are zeroed; values below ``length`` match the host
    pipeline exactly (same float math, f32 vs f64 accumulation aside).
    """
    T = signal.shape[0]
    dtype = signal.dtype
    t_idx = jnp.arange(T)
    valid = t_idx < length
    sig = jnp.where(valid, signal, 1.0)
    sig = jnp.where(sig == 0, 1e-7, sig)
    log_sig = jnp.where(valid, jnp.log(sig), 0.0)
    n = jnp.maximum(length, 1).astype(dtype)
    mean = jnp.sum(log_sig) / n
    var = jnp.sum(jnp.where(valid, (log_sig - mean) ** 2, 0.0)) / n
    std = jnp.sqrt(var)
    normed = jnp.where(valid, (log_sig - mean) / (std + 1e-7), 0.0)

    rows = []
    consts = scale_constants(n_scales)
    for width, c in zip(scale_widths(n_scales, tau), consts):
        max_pts = int(10 * width)
        M = min(max_pts, T)
        pts = jnp.minimum(max_pts, length)
        amp = 2 / (np.sqrt(3 * width) * np.pi**0.25)
        j = jnp.arange(M)
        vec = j.astype(dtype) - (pts.astype(dtype) - 1.0) / 2.0
        xsq = vec**2
        k = amp * (1 - xsq / width**2) * jnp.exp(-xsq / (2 * width**2))
        k = jnp.where(j < pts, k, 0.0)
        full = jnp.convolve(normed, k, mode="full")
        start = jnp.maximum(pts - 1, 0) // 2
        row = jax.lax.dynamic_slice(full, (start,), (T,))
        rows.append(jnp.where(valid, row * c, 0.0))
    return {
        "signal": log_sig,
        "spectrogram": jnp.stack(rows, axis=-1),
        "mean": mean,
        "std": std,
    }


def decompose_np(signal: np.ndarray) -> dict:
    """Host-side (numpy) twin of :func:`decompose` for the ragged data
    pipeline — identical math, no per-length recompilation."""
    signal = np.asarray(signal, dtype=np.float64).copy()
    signal[signal == 0] = 1e-7
    original = signal.copy()
    log_sig = np.log(signal)
    mean, std = log_sig.mean(), log_sig.std()
    normed = (log_sig - mean) / (std + 1e-7)
    rows = []
    for width, c in zip(scale_widths(), scale_constants()):
        points = int(min(10 * width, len(signal)))
        rows.append(np.convolve(normed, ricker(points, width), mode="same") * c)
    return {
        "signal": log_sig,
        "original_signal": original,
        "spectrogram": np.stack(rows).T,
        "mean": mean,
        "std": std,
    }


def recompose(spectrogram: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Inverse transform (cwt.py:18-21,48-50): sum scales (last axis),
    z-renormalize, then rescale by the predicted mean/std."""
    sig = jnp.sum(spectrogram, axis=-1)
    sig = (sig - jnp.mean(sig)) / (jnp.std(sig) + 1e-7)
    return sig * std + mean
