"""Speech-to-Reverberation Modulation energy Ratio (SRMR), pure JAX.

The reference extracts a per-frame SRMR variance through a numba-based
SRMRpy fork (reference ``litfass/dataset/datasets.py:119,622-628``,
``pyproject.toml:36``; SURVEY.md §2.9 #6). This is a from-scratch
implementation of the published algorithm (Falk, Zheng & Chan 2010):

1. 23-channel gammatone filterbank, ERB-spaced from 125 Hz,
2. temporal envelopes via the Hilbert transform,
3. modulation spectrogram: 256 ms Hamming windows at 64 ms hop, energy
   integrated in 8 modulation bands with the standard center frequencies
   (4..128 Hz, Q=2),
4. SRMR = sum(modulation bands 1-4) / sum(bands 5-8), per window.

Everything is FFT-based (MXU/VPU-friendly) with static shapes per input
length; the per-window ratios are linearly interpolated onto the mel frame
grid like the reference (``datasets.py:622-628``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MOD_CENTERS = np.array([4.0, 6.5, 10.7, 17.6, 28.9, 47.5, 78.1, 128.0])
N_GAMMATONE = 23
GT_LOW = 125.0


def erb_space(low: float, high: float, n: int) -> np.ndarray:
    """ERB-rate-spaced center frequencies (Glasberg & Moore)."""
    ear_q, min_bw = 9.26449, 24.7
    lo = np.log(low + ear_q * min_bw)
    hi = np.log(high + ear_q * min_bw)
    return np.exp(np.linspace(lo, hi, n)) - ear_q * min_bw


@functools.lru_cache(maxsize=4)
def gammatone_fir(sampling_rate: int, n_taps: int = 512) -> np.ndarray:
    """(n_channels, n_taps) 4th-order gammatone impulse responses."""
    high = min(sampling_rate / 2 * 0.9, 8000.0)
    cfs = erb_space(GT_LOW, high, N_GAMMATONE)
    t = np.arange(n_taps) / sampling_rate
    firs = []
    for cf in cfs:
        erb = 24.7 * (4.37 * cf / 1000 + 1)
        b = 1.019 * erb
        ir = t**3 * np.exp(-2 * np.pi * b * t) * np.cos(2 * np.pi * cf * t)
        ir /= max(np.sqrt(np.sum(ir**2)), 1e-30)  # unit energy
        firs.append(ir)
    return np.stack(firs).astype(np.float32)


def _fft_filterbank(wav: jnp.ndarray, firs: jnp.ndarray) -> jnp.ndarray:
    """Convolve wav (N,) with each FIR -> (C, N) via FFT."""
    N = wav.shape[-1]
    K = firs.shape[-1]
    n_fft = 1
    while n_fft < N + K:
        n_fft *= 2
    W = jnp.fft.rfft(wav, n=n_fft)
    F = jnp.fft.rfft(firs, n=n_fft, axis=-1)
    out = jnp.fft.irfft(F * W[None, :], n=n_fft, axis=-1)
    return out[:, :N]


def _envelope(x: jnp.ndarray) -> jnp.ndarray:
    """|analytic signal| per channel via the Hilbert transform."""
    N = x.shape[-1]
    X = jnp.fft.fft(x, axis=-1)
    h = jnp.zeros(N)
    if N % 2 == 0:
        h = h.at[0].set(1).at[N // 2].set(1).at[1 : N // 2].set(2)
    else:
        h = h.at[0].set(1).at[1 : (N + 1) // 2].set(2)
    return jnp.abs(jnp.fft.ifft(X * h[None, :], axis=-1))


def srmr_per_window(
    wav: jnp.ndarray,
    sampling_rate: int = 22050,
    window_s: float = 0.256,
    hop_s: float = 0.064,
) -> jnp.ndarray:
    """Per-window SRMR values, (n_windows,)."""
    firs = jnp.asarray(gammatone_fir(sampling_rate))
    bands = _fft_filterbank(wav.astype(jnp.float32), firs)  # (C, N)
    env = _envelope(bands)  # (C, N)

    win = int(window_s * sampling_rate)
    hop = int(hop_s * sampling_rate)
    N = env.shape[-1]
    n_windows = max(1 + (N - win) // hop, 1)
    idx = jnp.arange(n_windows)[:, None] * hop + jnp.arange(win)[None, :]
    idx = jnp.minimum(idx, N - 1)
    frames = env[:, idx]  # (C, W, win)
    hamming = jnp.asarray(np.hamming(win), jnp.float32)
    frames = (frames - jnp.mean(frames, axis=-1, keepdims=True)) * hamming

    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # (C, W, F)
    freqs = np.fft.rfftfreq(win, 1.0 / sampling_rate)

    # Q=2 band masks around the standard modulation centers
    band_energy = []
    for cf in MOD_CENTERS:
        bw = cf / 2.0
        mask = jnp.asarray(
            ((freqs >= cf - bw / 2) & (freqs <= cf + bw / 2)).astype(np.float32)
        )
        band_energy.append(jnp.sum(spec * mask[None, None, :], axis=-1))
    be = jnp.stack(band_energy, axis=-1)  # (C, W, 8)

    low = jnp.sum(be[..., :4], axis=(0, 2))
    high = jnp.sum(be[..., 4:], axis=(0, 2))
    return low / jnp.maximum(high, 1e-8)


def frame_srmr_padded(
    wav: jnp.ndarray,
    length: jnp.ndarray,
    n_frames: jnp.ndarray,
    max_frames: int,
    sampling_rate: int = 22050,
    window_s: float = 0.256,
    hop_s: float = 0.064,
) -> jnp.ndarray:
    """Static-shape twin of ``frame_srmr`` for the on-device feature path
    (train/on_device_features.py): ``wav`` is a zero-padded (N_max,)
    bucket, ``length`` its true sample count, ``n_frames`` the true mel
    frame count; returns (max_frames,) with the interpolated SRMR on the
    first ``n_frames`` positions.

    Deviation vs the host path (documented): the Hilbert envelope is
    taken over the PADDED buffer instead of the exact utterance length —
    the analytic-signal kernel decays like 1/t, so in-signal windows
    shift by <1e-3 relative (asserted in tests); windows past the true
    length are excluded from the interpolation exactly like the host's.
    """
    values = srmr_per_window(wav, sampling_rate, window_s, hop_s)  # (Wm,)
    win = int(window_s * sampling_rate)
    hop = int(hop_s * sampling_rate)
    n_valid = jnp.maximum(1 + (length - win) // hop, 1)  # dynamic scalar
    w_max = values.shape[0]

    # linear interp of a dynamic-length prefix onto a dynamic-length
    # frame prefix, all in static shapes (datasets.py:622-628 semantics)
    j = jnp.arange(max_frames, dtype=jnp.float32)
    denom = jnp.maximum(n_frames.astype(jnp.float32) - 1.0, 1.0)
    pos = j / denom * (n_valid.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, w_max - 1)
    hi = jnp.clip(lo + 1, 0, w_max - 1)
    # clamp into the VALID prefix so padding windows never leak in
    lo = jnp.minimum(lo, n_valid - 1)
    hi = jnp.minimum(hi, n_valid - 1)
    frac = jnp.clip(pos - lo.astype(jnp.float32), 0.0, 1.0)
    out = values[lo] * (1.0 - frac) + values[hi] * frac
    # single-window utterances are constant (np.repeat on the host)
    out = jnp.where(n_valid > 1, out, values[0])
    return out


def frame_srmr(
    wav: np.ndarray,
    n_frames: int,
    sampling_rate: int = 22050,
) -> np.ndarray:
    """SRMR interpolated onto the mel frame grid (datasets.py:622-628:
    single window -> constant, else linear interp over [0, 1])."""
    values = np.asarray(srmr_per_window(jnp.asarray(wav), sampling_rate))
    if len(values) == 1:
        return np.repeat(values, n_frames)
    src = np.linspace(0, 1, len(values))
    dst = np.linspace(0, 1, n_frames)
    return np.interp(dst, src, values)
