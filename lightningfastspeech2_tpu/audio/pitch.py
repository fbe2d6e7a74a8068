"""On-device fundamental-frequency (F0) estimation in pure JAX.

The reference extracts pitch with pyworld's DIO + StoneMask C++ code on the
CPU per dataloader worker (reference ``litfass/dataset/datasets.py:566-582``,
speed=4 from pitch_quality 0.25, frame period = hop/sr*1000 ms). Here pitch
runs on-device as a batched, FFT-based YIN tracker (de Cheveigne & Kawahara
2002) on the same frame grid, so online prosody extraction costs no host
round-trip (BASELINE.json north star). Post-processing mirrors the
reference: unvoiced frames -> NaN, silence -> NaN, linear interpolation fill
(``datasets.py:576-582,830-837``).

Differences from DIO are within normal F0-tracker tolerance; a C++
DIO/StoneMask parity path is planned for exact offline reproduction
(SURVEY.md §2.9 #3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F0_FLOOR = 71.0   # pyworld default
F0_CEIL = 800.0   # pyworld default
YIN_THRESHOLD = 0.15


def _difference_function(frames: jnp.ndarray, tau_max: int) -> jnp.ndarray:
    """YIN difference d(tau) for all frames at once via FFT correlation.

    frames: (T, W + tau_max) windows. Returns (T, tau_max + 1).
    d(tau) = sum_{j<W} (x[j] - x[j+tau])^2
           = e0 + e_tau - 2 * sum_j x[j] x[j+tau]
    """
    T, L = frames.shape
    W = L - tau_max
    sq = jnp.square(frames)
    csum = jnp.concatenate([jnp.zeros((T, 1)), jnp.cumsum(sq, axis=-1)], axis=-1)
    e0 = csum[:, W] - csum[:, 0]                       # (T,)
    taus = jnp.arange(tau_max + 1)
    e_tau = csum[:, W + taus] - csum[:, taus]          # (T, tau_max+1)

    # cross-correlation of x[0:W] with the full window, lags 0..tau_max
    n_fft = 1
    while n_fft < L + W:
        n_fft *= 2
    head = jnp.where(jnp.arange(L) < W, frames, 0.0)
    F_head = jnp.fft.rfft(head, n=n_fft, axis=-1)
    F_full = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    corr = jnp.fft.irfft(jnp.conj(F_head) * F_full, n=n_fft, axis=-1)
    cross = corr[:, : tau_max + 1]

    return e0[:, None] + e_tau - 2.0 * cross


def _cmnd(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative mean normalized difference d'(tau); d'(0) = 1."""
    taus = jnp.arange(1, d.shape[-1])
    cum = jnp.cumsum(d[:, 1:], axis=-1)
    dprime = d[:, 1:] * taus / jnp.maximum(cum, 1e-12)
    return jnp.concatenate([jnp.ones((d.shape[0], 1)), dprime], axis=-1)


def yin_frame_f0(
    frames: jnp.ndarray,
    sampling_rate: int,
    f0_floor: float = F0_FLOOR,
    f0_ceil: float = F0_CEIL,
    threshold: float = YIN_THRESHOLD,
) -> jnp.ndarray:
    """F0 per frame; 0.0 where unvoiced. frames: (T, W + tau_max)."""
    tau_min = max(int(sampling_rate / f0_ceil), 2)
    tau_max = int(sampling_rate / f0_floor) + 1
    d = _difference_function(frames, tau_max)
    dp = _cmnd(d)  # (T, tau_max+1)

    taus = jnp.arange(dp.shape[-1])
    in_range = (taus >= tau_min) & (taus < tau_max)
    dpr = jnp.where(in_range[None, :], dp, jnp.inf)

    # absolute-threshold rule: first tau whose d' dips under threshold and
    # is a local minimum; fall back to the global minimum
    below = dpr < threshold
    is_min = jnp.pad(
        (dpr[:, 1:-1] <= dpr[:, :-2]) & (dpr[:, 1:-1] <= dpr[:, 2:]),
        ((0, 0), (1, 1)),
        constant_values=False,
    )
    candidate = below & is_min
    first_idx = jnp.argmax(candidate, axis=-1)
    has_candidate = jnp.any(candidate, axis=-1)
    argmin_idx = jnp.argmin(dpr, axis=-1)
    tau_star = jnp.where(has_candidate, first_idx, argmin_idx)

    # parabolic interpolation around tau_star
    t = jnp.clip(tau_star, 1, dp.shape[-1] - 2)
    rows = jnp.arange(dp.shape[0])
    y0, y1, y2 = dp[rows, t - 1], dp[rows, t], dp[rows, t + 1]
    denom = y0 - 2 * y1 + y2
    offset = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (y0 - y2) / denom, 0.0)
    offset = jnp.clip(offset, -0.5, 0.5)
    tau_refined = t + offset

    f0 = sampling_rate / jnp.maximum(tau_refined, 1.0)
    voiced = dp[rows, t] < jnp.maximum(threshold * 2.0, 0.3)
    f0 = jnp.where(voiced & (f0 >= f0_floor) & (f0 <= f0_ceil), f0, 0.0)
    return f0.astype(jnp.float32)


def track(
    wav: jnp.ndarray,
    sampling_rate: int = 22050,
    hop_length: int = 256,
    win_length: int = 1024,
    f0_floor: float = F0_FLOOR,
    f0_ceil: float = F0_CEIL,
) -> jnp.ndarray:
    """F0 track on the mel frame grid: (1 + len//hop,) with 0 = unvoiced.

    Frame t is centered like the STFT frames (window [t*hop - W/2,
    t*hop + W/2 + tau_max) with zero padding), so pitch, energy and mel all
    share a time base.
    """
    n = wav.shape[-1]
    tau_max = int(sampling_rate / f0_floor) + 1
    span = win_length + tau_max
    pad_left = win_length // 2
    padded = jnp.pad(wav.astype(jnp.float32), (pad_left, span))
    n_frames = 1 + n // hop_length
    from lightningfastspeech2_tpu.audio.mel import overlapping_frames

    frames = overlapping_frames(padded, n_frames, hop_length, span)
    return yin_frame_f0(frames, sampling_rate, f0_floor, f0_ceil)


@functools.partial(jax.jit, static_argnames=("sampling_rate", "hop_length", "win_length"))
def track_jit(wav, sampling_rate=22050, hop_length=256, win_length=1024):
    return track(wav, sampling_rate, hop_length, win_length)
