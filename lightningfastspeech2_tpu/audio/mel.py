"""Pure-JAX mel-spectrogram front-end.

Reproduces the reference's torchaudio+librosa pipeline exactly
(reference ``litfass/dataset/datasets.py:184-199,373-396``,
``litfass/dataset/audio_utils.py:8-12``):

- magnitude spectrogram: n_fft 1024, win 1024, hop 256, periodic Hann,
  power 1.0, centered with **constant** (zero) padding,
- linear->mel via the librosa Slaney-scale filterbank (htk=False,
  norm='slaney'),
- log10 dynamic-range compression with clip 1e-6,
- transposed to (T, n_mels).

Runs on-device under jit (the BASELINE north star moves prosody extraction
on-device); shapes are static per wav-length bucket.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core.config import AudioConfig


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default periodic=True)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel with htk=False, norm='slaney')
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3  # Hz per mel below the break frequency
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region, _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mel
    )
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: float,
) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) Slaney-normalized triangular filterbank."""
    fft_freqs = np.linspace(0, sampling_rate / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def mel_filterbank_htk(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float,
    f_max: float,
) -> np.ndarray:
    """HTK-scale unnormalized triangular filterbank (torchaudio
    MelSpectrogram defaults: mel_scale='htk', norm=None), (n_mels, bins).
    Used by the d-vector front-end (third_party/dvectors/wav2mel.py)."""
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)
    mel2hz = lambda m: 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    fft_freqs = np.linspace(0, sampling_rate / 2, 1 + n_fft // 2)
    hz_pts = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    return np.maximum(0.0, np.minimum(lower, upper)).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT magnitude
# ---------------------------------------------------------------------------

def frame_signal(wav: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad with zeros and cut into (T, n_fft) frames.

    Matches torch.stft(center=True, pad_mode='constant'):
    T = 1 + len(wav) // hop.
    """
    pad = n_fft // 2
    padded = jnp.pad(wav, (pad, pad))
    n_frames = 1 + wav.shape[-1] // hop_length
    return overlapping_frames(padded, n_frames, hop_length, n_fft)


def overlapping_frames(
    padded: jnp.ndarray, n_frames: int, hop: int, span: int
) -> jnp.ndarray:
    """(n_frames, span) stride-``hop`` windows of a 1-D signal, built from
    contiguous slice+reshape column groups instead of a fancy gather:
    window[t, q*hop + r] == padded[hop*(t+q) + r]. TPU gathers serialize —
    the gather formulation cost +21% on the whole mel front-end."""
    q_groups = -(-span // hop)
    # each group's slice spans [q*hop, q*hop + hop*n_frames); positions
    # past ``span`` are trimmed below, so over-padding is only ever
    # zeros that get dropped
    need = hop * (n_frames - 1 + q_groups)
    if padded.shape[-1] < need:
        padded = jnp.pad(padded, (0, need - padded.shape[-1]))
    cols = []
    for q in range(q_groups):
        width = min(hop, span - q * hop)
        col = jax.lax.slice_in_dim(
            padded, q * hop, q * hop + hop * n_frames, axis=-1
        ).reshape(n_frames, hop)
        cols.append(col if width == hop else col[:, :width])
    return jnp.concatenate(cols, axis=-1)


def spectrogram(
    wav: jnp.ndarray,
    n_fft: int = 1024,
    win_length: int = 1024,
    hop_length: int = 256,
) -> jnp.ndarray:
    """Power-1.0 (magnitude) spectrogram, (T, 1 + n_fft//2), f32.

    win_length == n_fft in the reference config; shorter windows would be
    zero-centered inside the FFT frame like torch.stft.
    """
    frames = frame_signal(wav.astype(jnp.float32), n_fft, hop_length)
    win = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.abs(spec)


def log_compress(x: jnp.ndarray, clip_val: float = 1e-6, log10: bool = True,
                 C: float = 1.0) -> jnp.ndarray:
    """Dynamic-range compression (audio_utils.py:8-12)."""
    clipped = jnp.clip(x, min=clip_val) * C
    return jnp.log10(clipped) if log10 else jnp.log(clipped)


def mel_spectrogram(wav: jnp.ndarray, cfg: AudioConfig = AudioConfig()) -> jnp.ndarray:
    """Full front-end: wav (N,) -> log-mel (T, n_mels), T = 1 + N//hop."""
    spec = spectrogram(wav, cfg.n_fft, cfg.win_length, cfg.hop_length)
    basis = jnp.asarray(
        mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max)
    )
    mel = spec @ basis.T  # (T, n_mels)
    return log_compress(mel, cfg.clip_val, cfg.log10)


def normalize_wav(wav: jnp.ndarray) -> jnp.ndarray:
    """Peak normalization as done at load time (datasets.py:369)."""
    return wav / jnp.max(jnp.abs(wav))


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram_jit(wav: jnp.ndarray, cfg: AudioConfig = AudioConfig()) -> jnp.ndarray:
    return mel_spectrogram(wav, cfg)
