"""Post-vocoder audio restoration — the VoiceFixer-slot analog.

The reference pipes vocoder output through the external ``voicefixer``
package (reference ``litfass/synthesis/generator.py:173-195``: resample to
22.05 kHz, pad 0.1 s, ``restore(mode=1)`` via temp wav files, unpad;
outputs saved at 44.1 kHz per ``generator.py:81-94``). That package — a
44.1 kHz neural ResUNet restorer with released weights — is unavailable
offline, so this module provides the same serving contract with an
on-device (JAX) restoration chain:

1. **declipping** — rail-limited runs are rebuilt by cubic Hermite
   interpolation from the surrounding samples and slopes, so flattened
   sine peaks are re-arched above the rail instead of left flat;
2. **spectral-gating denoise** — a per-bin noise floor estimated from the
   quietest frames drives a soft Wiener mask (with over-subtraction and a
   spectral floor), time-smoothed to avoid musical noise;
3. **exact 2x band-limited upsampling** to 44.1 kHz (rfft zero-padding);
4. **spectral band replication** — the empty 11–22 kHz octave left by a
   22.05 kHz vocoder is filled by shifting the 5.5–11 kHz band up with
   decaying gains, so the restored audio has air-band content like the
   reference's 44.1 kHz restorer.

Everything is jnp, jit-compiled per wav-length bucket — no temp-file
subprocess I/O like the reference. It runs on the host CPU backend by
default (serving post-process, like the reference's; some TPU runtimes
lack the odd-size FFTs the 2x resampler needs) but the same jitted code
targets any backend. Unlike the reference, the 0.1 s pad is removed at
the *output* rate
(the reference strips ``pad_width`` input-rate samples from the 44.1 kHz
output, leaving half the pad in — ``generator.py:185,194``; a defect we do
not replicate, SURVEY.md "defects to NOT replicate").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_N_FFT = 1024
_HOP = 256


def _hann(n_fft: int = _N_FFT) -> jnp.ndarray:
    return jnp.hanning(n_fft + 1)[:-1].astype(jnp.float32)


def stft(x: jnp.ndarray, n_fft: int = _N_FFT, hop: int = _HOP) -> jnp.ndarray:
    """Center-padded (constant) complex STFT, frames on axis 0."""
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad))
    n_frames = 1 + (xp.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = xp[idx] * _hann(n_fft)
    return jnp.fft.rfft(frames, axis=-1)  # (T, F)


def istft(
    spec: jnp.ndarray, length: int, n_fft: int = _N_FFT, hop: int = _HOP
) -> jnp.ndarray:
    """Overlap-add inverse with squared-window normalization."""
    win = _hann(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win
    n_frames = spec.shape[0]
    out_len = n_fft + (n_frames - 1) * hop
    pos = (
        jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    ).reshape(-1)
    out = jnp.zeros(out_len, frames.dtype).at[pos].add(frames.reshape(-1))
    wsum = jnp.zeros(out_len, frames.dtype).at[pos].add(
        jnp.tile(win * win, n_frames)
    )
    out = out / jnp.maximum(wsum, 1e-8)
    pad = n_fft // 2
    return jax.lax.dynamic_slice(out, (pad,), (length,))


def declip(x: jnp.ndarray, threshold: float = 0.985) -> jnp.ndarray:
    """Rebuild rail-limited runs by cubic Hermite interpolation.

    Samples at >= ``threshold`` of the signal peak are treated as clipped;
    each run is replaced by the Hermite cubic through the nearest valid
    samples on either side using their local slopes, which re-arches the
    peak above the rail (a flat top has zero curvature; the true signal
    does not)."""
    n = x.shape[0]
    idx = jnp.arange(n)
    peak = jnp.max(jnp.abs(x))
    rail = threshold * peak
    at_rail = jnp.abs(x) >= rail
    # true clipping produces FLAT runs at the rail; a clean waveform's own
    # peak region is near the rail but still has curvature sample-to-sample
    flat_eps = 1e-3 * jnp.maximum(peak, 1e-9)
    flat = (jnp.abs(x - jnp.roll(x, 1)) < flat_eps) | (
        jnp.abs(x - jnp.roll(x, -1)) < flat_eps
    )
    clipped = at_rail & flat
    valid = ~clipped

    left = jax.lax.associative_scan(jnp.maximum, jnp.where(valid, idx, -1))
    right = jax.lax.associative_scan(
        jnp.minimum, jnp.where(valid, idx, n)[::-1]
    )[::-1]
    interior = (left >= 0) & (right < n)
    l = jnp.clip(left, 0, n - 1)
    r = jnp.clip(right, 0, n - 1)
    p0, p1 = x[l], x[r]
    # one-sample slopes just outside the run
    m0 = p0 - x[jnp.clip(l - 1, 0, n - 1)]
    m1 = x[jnp.clip(r + 1, 0, n - 1)] - p1
    span = (r - l).astype(x.dtype)
    t = jnp.where(span > 0, (idx - l).astype(x.dtype) / jnp.maximum(span, 1), 0.0)
    t2, t3 = t * t, t * t * t
    y = (
        (2 * t3 - 3 * t2 + 1) * p0
        + (t3 - 2 * t2 + t) * span * m0
        + (-2 * t3 + 3 * t2) * p1
        + (t3 - t2) * span * m1
    )
    return jnp.where(clipped & interior, y, x)


def spectral_denoise(
    x: jnp.ndarray,
    length: jnp.ndarray,
    strength: float = 3.0,
    floor: float = 0.03,
) -> jnp.ndarray:
    """Power spectral subtraction with a noise floor learned from the
    quietest valid frames (10th magnitude percentile per bin).

    Power subtraction (gain = sqrt(1 - (s*noise/mag)^2)) barely touches
    strong bins — unlike a Wiener gain it costs <0.1% amplitude on
    speech/tone partials while the over-subtraction factor ``strength``
    drives noise-only bins to the ``floor``."""
    spec = stft(x)
    mag = jnp.abs(spec)
    frame_start = jnp.arange(spec.shape[0]) * _HOP
    frame_valid = frame_start < length
    masked = jnp.where(frame_valid[:, None], mag, jnp.nan)
    noise = jnp.nanquantile(masked, 0.10, axis=0)  # (F,)
    # steady tonal content (a held vowel / test tone) never drops to the
    # floor in its own bin; cap per-bin estimates at a multiple of the
    # cross-bin median, which tracks the broadband floor
    noise = jnp.minimum(noise, 6.0 * jnp.nanmedian(noise))
    g2 = 1.0 - (strength * noise / jnp.maximum(mag, 1e-8)) ** 2
    gain = jnp.sqrt(jnp.clip(g2, floor**2, 1.0))
    # 3-tap time smoothing against musical noise
    gain = (jnp.roll(gain, 1, 0) + gain + jnp.roll(gain, -1, 0)) / 3.0
    return istft(spec * gain, x.shape[0])


def upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact band-limited 2x upsampling via rfft zero-padding."""
    n = x.shape[0]
    X = jnp.fft.rfft(x)
    Y = jnp.zeros(n + 1, X.dtype).at[: X.shape[0]].set(X)
    return jnp.fft.irfft(Y, n=2 * n) * 2.0


def band_replicate(
    x: jnp.ndarray, gains: tuple = (0.5, 0.22)
) -> jnp.ndarray:
    """Fill the empty top octave after 2x upsampling: shift the
    quarter-to-half-Nyquist band up (twice, with decaying gain),
    donor phase preserved."""
    spec = stft(x)
    n_bins = spec.shape[1]
    q = (n_bins - 1) // 4  # quarter-Nyquist bin count
    donor = spec[:, q : 2 * q]
    out = spec
    out = out.at[:, 2 * q : 3 * q].add(donor * gains[0])
    out = out.at[:, 3 * q : 4 * q].add(donor * gains[1])
    return istft(out, x.shape[0])


def neural_denoise(x: jnp.ndarray, dn_params, length=None) -> jnp.ndarray:
    """Learned-mask denoise (synthesis/denoiser.py): the VoiceFixer-slot
    *neural* prior the DSP chain lacked — masks the magnitude, keeps the
    phase, same floor as the spectral gate. ``length`` (valid samples of
    a bucket-padded x) keeps the mask net's normalization on REAL frames
    — without it the zero pad drags the stats and the mask goes
    transparent (denoiser.apply_mask_net docstring)."""
    from lightningfastspeech2_tpu.synthesis.denoiser import apply_mask_net

    spec = stft(x)
    mag = jnp.abs(spec)
    frame_valid = None
    if length is not None:
        frame_valid = jnp.arange(mag.shape[0]) * _HOP < length
    masked = apply_mask_net(dn_params, mag, frame_valid=frame_valid)
    phase = spec / jnp.maximum(mag, 1e-8)
    return istft(phase * masked, x.shape[0])


@functools.partial(
    jax.jit, static_argnames=("bucket", "strength", "threshold", "sbr")
)
def _restore_padded(
    x: jnp.ndarray,
    length: jnp.ndarray,
    bucket: int,
    strength: float,
    threshold: float,
    sbr: bool,
    dn_params=None,
):
    del bucket  # shapes carry it; static arg keys the jit cache
    y = declip(x, threshold)
    if dn_params is not None:
        y = neural_denoise(y, dn_params, length=length)
    else:
        y = spectral_denoise(y, length, strength=strength)
    y = upsample_2x(y)
    if sbr:
        y = band_replicate(y)
    return y


class AudioRestorer:
    """Serving-contract wrapper: ``restorer(wav, sr) -> wav @ 44.1 kHz``.

    Mirrors the reference flow (pad 0.1 s -> restore -> unpad,
    ``generator.py:183-195``) without the temp-file round-trip. Plug it
    into ``SpeechGenerator(postprocess=...)``; the generator reads
    ``output_sampling_rate`` to save at 44.1 kHz like the reference's
    ``save_audio`` (``generator.py:81-94``).
    """

    input_sampling_rate = 22050
    output_sampling_rate = 44100

    def __init__(
        self,
        denoise_strength: float = 3.0,
        declip_threshold: float = 0.985,
        sbr: bool = True,
        pad_seconds: float = 0.1,
        bucket_step: int = 16384,
        denoiser: str = "auto",
    ):
        self.denoise_strength = float(denoise_strength)
        self.declip_threshold = float(declip_threshold)
        self.sbr = bool(sbr)
        self.pad_seconds = float(pad_seconds)
        self.bucket_step = int(bucket_step)
        # "neural": learned-mask denoise (denoiser.py builtin weights,
        # the VoiceFixer-slot prior); "spectral": the DSP gate; "auto":
        # neural when the in-tree weights exist, else spectral
        self._dn_params = None
        if denoiser in ("auto", "neural"):
            from lightningfastspeech2_tpu.synthesis import denoiser as dn

            self._dn_params = dn.load()
            if self._dn_params is None:
                if denoiser == "neural":
                    raise FileNotFoundError(
                        f"no denoiser weights at {dn.BUILTIN_PATH}; run "
                        "scripts/train_denoiser.py"
                    )
                # the downgrade must be LOUD: an eval "with denoiser"
                # that silently measures the spectral gate reports the
                # wrong thing (VERDICT r4 weak #8)
                import logging

                logging.getLogger(__name__).warning(
                    "denoiser='auto': no weights at %s — falling back "
                    "to the spectral gate (run scripts/train_denoiser.py "
                    "for the learned-mask path)", dn.BUILTIN_PATH)
        self._device = None  # resolved lazily

    def _restore_device(self):
        """Serving runs host-side by default (like the reference's
        CPU-process VoiceFixer): some TPU runtimes lack the odd-size FFTs
        the resampler needs, and the chip should stay busy vocoding."""
        if self._device is None:
            import jax as _jax

            try:
                self._device = _jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                self._device = _jax.devices()[0]
        return self._device

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if sr != self.input_sampling_rate:
            # reference resamples to 22050 before restoring
            # (generator.py:180-182)
            n_out = int(round(len(wav) * self.input_sampling_rate / sr))
            t_in = np.arange(len(wav)) / sr
            t_out = np.arange(n_out) / self.input_sampling_rate
            wav = np.interp(t_out, t_in, wav).astype(np.float32)
            sr = self.input_sampling_rate
        pad = int(sr * self.pad_seconds)
        padded = np.pad(wav, (pad, pad))
        bucket = max(
            self.bucket_step,
            int(np.ceil(len(padded) / self.bucket_step)) * self.bucket_step,
        )
        buf = np.zeros(bucket, np.float32)
        buf[: len(padded)] = padded
        with jax.default_device(self._restore_device()):
            out = np.asarray(
                _restore_padded(
                    jnp.asarray(buf),
                    jnp.int32(len(padded)),
                    bucket,
                    self.denoise_strength,
                    self.declip_threshold,
                    self.sbr,
                    self._dn_params,
                ),
                np.float32,
            )
        # unpad at the OUTPUT rate (the reference strips input-rate
        # pad_width from 44.1k audio, leaving half the pad — not replicated)
        start = 2 * pad
        return out[start : start + 2 * len(wav)]
