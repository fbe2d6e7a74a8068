"""Frame-level prosody features and their post-processing.

Energy (RMS), NaN interpolation, phone-level averaging, normalization and
transform selection — matching the reference's online extraction
(reference ``litfass/dataset/datasets.py:566-648,796-837``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def frame_energy(wav: jnp.ndarray, hop_length: int = 256,
                 win_length: int = 1024) -> jnp.ndarray:
    """Per-frame RMS energy.

    Frame x spans samples [x*hop, x*hop + win); the divisor is always
    ``win_length`` even for the truncated tail windows, and the number of
    frames is ceil(len/hop) (datasets.py:601-620). Implemented as a cumsum
    difference so it vectorizes on TPU.
    """
    n = wav.shape[-1]
    n_frames = -(-n // hop_length)
    sq = jnp.square(wav.astype(jnp.float32))
    csum = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(sq)])
    starts = jnp.minimum(jnp.arange(n_frames) * hop_length, n)
    ends = jnp.minimum(starts + win_length, n)
    # clamp: float cumsum differences can dip microscopically below zero
    window_sums = jnp.maximum(csum[ends] - csum[starts], 0.0)
    return jnp.sqrt(window_sums / win_length)


def interpolate_nans(x: np.ndarray) -> np.ndarray:
    """Linear interpolation over NaN runs (datasets.py:830-837 semantics:
    np.interp over non-NaN support; edge NaNs take the nearest valid
    value)."""
    x = np.asarray(x, dtype=np.float64).copy()
    nans = np.isnan(x)
    if nans.all() or not nans.any():
        return x
    idx = np.arange(len(x))
    x[nans] = np.interp(idx[nans], idx[~nans], x[~nans])
    return x


def interpolate_nans_jnp(x: jnp.ndarray) -> jnp.ndarray:
    """On-device NaN linear interpolation.

    For each NaN position, find the nearest valid neighbors on each side
    and linearly interpolate; positions outside the valid support clamp to
    the boundary value (np.interp behavior).
    """
    n = x.shape[-1]
    idx = jnp.arange(n)
    valid = ~jnp.isnan(x)

    # nearest valid index to the left (or -1), via cummax of masked indices
    left = jax.lax.associative_scan(jnp.maximum, jnp.where(valid, idx, -1))
    # nearest valid index to the right (or n), via reversed cummin
    right = jax.lax.associative_scan(
        jnp.minimum, jnp.where(valid, idx, n)[::-1]
    )[::-1]

    left_c = jnp.clip(left, 0, n - 1)
    right_c = jnp.clip(right, 0, n - 1)
    xl = x[left_c]
    xr = x[right_c]
    # interpolation weight; guard division when left==right
    denom = jnp.maximum(right_c - left_c, 1)
    w = (idx - left_c) / denom
    interp = xl * (1 - w) + xr * w
    # edge handling: no left neighbor -> right value; no right -> left value
    interp = jnp.where(left < 0, xr, interp)
    interp = jnp.where(right >= n, xl, interp)
    return jnp.where(valid, x, interp)


def phone_average(values: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Average a frame-level signal over each phone's duration span
    (datasets.py:632-640). Zero-duration phones get 1e-7."""
    out = np.empty(len(durations), dtype=np.float64)
    pos = 0
    for j, d in enumerate(durations):
        d = int(d)
        if d > 0:
            out[j] = np.mean(values[pos : pos + d])
        else:
            out[j] = 1e-7
        pos += d
    return out


def phone_average_jnp(values: jnp.ndarray, durations: jnp.ndarray,
                      max_phones: int) -> jnp.ndarray:
    """Vectorized on-device phone averaging via segment sums.

    ``values``: (T,) frame signal; ``durations``: (P,) int frame counts
    (padded with zeros). Returns (max_phones,) phone-level means with 1e-7
    at zero-duration slots.
    """
    ends = jnp.cumsum(durations)
    t = jnp.arange(values.shape[0])
    # phone id of each frame = #ends <= t
    seg = jnp.searchsorted(ends, t, side="right")
    sums = jax.ops.segment_sum(values, seg, num_segments=max_phones)
    means = sums / jnp.maximum(durations[:max_phones], 1)
    return jnp.where(durations[:max_phones] > 0, means, 1e-7)


def expand_by_duration(values: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Repeat each phone value duration times (TTSDataset._expand,
    datasets.py:818-828)."""
    return np.repeat(np.asarray(values), np.maximum(durations, 0).astype(int))


def znormalize(x, mean: float, std: float):
    return (x - mean) / std


def denormalize(x, mean: float, std: float):
    return x * std + mean


def augment_durations(
    durations: np.ndarray, rng: np.random.Generator, augment_fraction: float
) -> np.ndarray:
    """Random duration jitter preserving the total (datasets.py:796-816):
    a random subset of phones gets +-N(0,1) rounded jitter, compensated on
    the same subset to keep sum(durations) constant, then clipped >= 0."""
    durations = np.asarray(durations).copy()
    if augment_fraction <= 0:
        return durations
    n = len(durations)
    k = int(np.round(n * augment_fraction))
    if k == 0:
        return durations
    idx = rng.choice(n, size=k, replace=False)
    jitter = np.round(rng.normal(0, 1, size=k)).astype(durations.dtype)
    total_before = durations.sum()
    durations[idx] += jitter
    durations = np.clip(durations, 0, None)
    # compensate to preserve total duration
    diff = durations.sum() - total_before
    i = 0
    while diff != 0 and i < 10 * n:
        j = idx[i % k]
        step = -np.sign(diff)
        if durations[j] + step >= 0:
            durations[j] += step
            diff += step
        i += 1
    return durations
