"""Audio front-end parity tests.

Golden references are computed with torch.stft (same backend the reference's
torchaudio Spectrogram wraps) and hand-rolled numpy implementations of the
reference's algorithms (librosa Slaney mel, scipy.signal.cwt semantics,
per-frame RMS loops from datasets.py:601-620).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningfastspeech2_tpu.audio import cwt as jcwt
from lightningfastspeech2_tpu.audio import features, mel, pitch, snr
from lightningfastspeech2_tpu.core.config import AudioConfig


@pytest.fixture(scope="module")
def wav(rng=None):
    g = np.random.default_rng(1234)
    n = 22050  # 1 s
    t = np.arange(n) / 22050
    sig = (
        0.6 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.05 * g.standard_normal(n)
    )
    return (sig / np.abs(sig).max()).astype(np.float32)


def torch_magnitude_spectrogram(wav_np, n_fft=1024, hop=256, win=1024):
    """torchaudio.transforms.Spectrogram(power=1.0, pad_mode='constant')
    equivalent via torch.stft."""
    x = torch.from_numpy(wav_np)
    spec = torch.stft(
        x,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        pad_mode="constant",
        return_complex=True,
    )
    return spec.abs().numpy()  # (freq, T)


def test_spectrogram_matches_torch_stft(wav):
    ours = np.asarray(mel.spectrogram(jnp.asarray(wav)))  # (T, F)
    ref = torch_magnitude_spectrogram(wav).T  # (T, F)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_mel_filterbank_matches_slaney_formula():
    fb = mel.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    # every filter positive somewhere, unimodal triangles, Slaney area norm
    assert (fb.sum(axis=1) > 0).all()
    # rows should peak at increasing frequencies
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    # Slaney normalization: peak value * bandwidth/2 ~ 1 (triangle area)
    # cross-check against librosa-published value for filter 0 at sr 22050:
    # hz points are linear below 1 kHz -> first band edges 0, f, 2f
    from lightningfastspeech2_tpu.audio.mel import _mel_to_hz, _hz_to_mel

    pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(8000.0), 82))
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-9)
    # analytic spacing: mel(8000) = 15 + ln(8)/(ln(6.4)/27) = 45.2456 mel,
    # so the first of 82 points sits at 45.2456/81 * (200/3) Hz = 37.239 Hz
    assert abs(pts[1] - 37.239) < 0.01


def test_log_mel_shape_and_compression(wav):
    m = np.asarray(mel.mel_spectrogram(jnp.asarray(wav)))
    assert m.shape == (1 + len(wav) // 256, 80)
    # log10 domain with clip at 1e-6 -> values >= -6
    assert m.min() >= -6.0 - 1e-6
    assert np.isfinite(m).all()


def test_frame_energy_matches_reference_loop(wav):
    hop, win = 256, 1024
    ours = np.asarray(features.frame_energy(jnp.asarray(wav), hop, win))
    n_frames = int(np.ceil(len(wav) / hop))
    ref = np.array(
        [
            np.sqrt(np.sum(wav[x * hop : x * hop + win] ** 2) / win)
            for x in range(n_frames)
        ]
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_interpolate_nans_matches_numpy():
    x = np.array([np.nan, 1.0, np.nan, np.nan, 4.0, np.nan], dtype=np.float64)
    got = features.interpolate_nans(x.copy())
    expected = np.array([1.0, 1.0, 2.0, 3.0, 4.0, 4.0])
    np.testing.assert_allclose(got, expected)

    got_j = np.asarray(features.interpolate_nans_jnp(jnp.asarray(x)))
    np.testing.assert_allclose(got_j, expected, atol=1e-6)


def test_phone_average_and_device_version_agree():
    g = np.random.default_rng(0)
    frames = g.standard_normal(50).astype(np.float32)
    durations = np.array([3, 0, 7, 10, 30], dtype=np.int32)
    host = features.phone_average(frames, durations)
    dev = np.asarray(
        features.phone_average_jnp(jnp.asarray(frames), jnp.asarray(durations), 5)
    )
    np.testing.assert_allclose(host, dev, atol=1e-5)


def numpy_cwt_reference(signal, n_scales=10, tau=0.2833425):
    """Old scipy.signal.cwt semantics, straight numpy."""
    rows = []
    for i in range(1, n_scales + 1):
        width = 2 ** (i + 1) * tau
        points = int(min(10 * width, len(signal)))
        wavelet = jcwt.ricker(points, width)
        rows.append(np.convolve(signal, wavelet, mode="same"))
    consts = np.array([(i + 2.5) ** (-5 / 2) for i in range(1, n_scales + 1)])
    return (np.stack(rows) * consts[:, None]).T  # (T, scales)


def test_cwt_decompose_matches_scipy_semantics():
    g = np.random.default_rng(3)
    sig = np.exp(g.standard_normal(500) * 0.3 + 5.0)  # positive "pitch"
    out = jcwt.decompose(jnp.asarray(sig))
    log_sig = np.log(sig)
    normed = (log_sig - log_sig.mean()) / (log_sig.std() + 1e-7)
    ref_spec = numpy_cwt_reference(normed)
    np.testing.assert_allclose(np.asarray(out["spectrogram"]), ref_spec, atol=1e-4)
    np.testing.assert_allclose(float(out["mean"]), log_sig.mean(), atol=1e-6)
    np.testing.assert_allclose(float(out["std"]), log_sig.std(), atol=1e-6)


def test_cwt_decompose_padded_matches_host_ragged():
    """decompose_padded (jitted, static buffer + traced true length) must
    reproduce decompose_np exactly on the true region — this is what lets
    CWT variances run inside the train step (on_device_features)."""
    g = np.random.default_rng(7)
    T = 512
    fn = jax.jit(jcwt.decompose_padded)
    for length in (7, 20, 50, 139, 300, 512):
        sig = np.exp(g.standard_normal(length) * 0.3 + 5.0)
        padded = np.zeros(T, np.float32)
        padded[:length] = sig
        out = fn(jnp.asarray(padded), jnp.int32(length))
        ref = jcwt.decompose_np(sig)
        np.testing.assert_allclose(
            np.asarray(out["signal"])[:length], ref["signal"],
            atol=1e-4, err_msg=f"signal L={length}",
        )
        np.testing.assert_allclose(
            np.asarray(out["spectrogram"])[:length], ref["spectrogram"],
            atol=2e-4, err_msg=f"spectrogram L={length}",
        )
        np.testing.assert_allclose(float(out["mean"]), ref["mean"], atol=1e-5)
        np.testing.assert_allclose(float(out["std"]), ref["std"], atol=1e-5)
        # padding region zeroed
        assert np.all(np.asarray(out["signal"])[length:] == 0)
        assert np.all(np.asarray(out["spectrogram"])[length:] == 0)


def test_cwt_recompose_roundtrip_correlation():
    g = np.random.default_rng(4)
    # smooth positive signal (pitch-like)
    base = np.cumsum(g.standard_normal(400)) * 0.01 + 5.4
    sig = np.exp(base)
    out = jcwt.decompose(jnp.asarray(sig))
    rec = np.asarray(jcwt.recompose(out["spectrogram"], out["mean"], out["std"]))
    # recomposition approximates the log signal up to wavelet truncation
    corr = np.corrcoef(rec, np.log(sig))[0, 1]
    assert corr > 0.95


def test_wada_table_monotonic_and_asymptotes():
    table = snr.g_table()
    assert table.shape == (121,)
    assert (np.diff(table) > 0).all()  # our table is exactly monotone
    # analytic asymptotes: Gaussian limit and Gamma(0.4) limit
    from scipy import special

    gauss = np.log(2) - 0.5 * np.log(np.pi) + 0.5772156649 / 2
    gamma_lim = np.log(0.4) - special.digamma(0.4)
    assert abs(table[0] - gauss) < 2e-4
    assert table[-1] < gamma_lim  # still converging at 100 dB


def test_wada_reference_table_agreement():
    """Compare against the reference's Monte-Carlo table when available."""
    import pathlib

    ref_path = pathlib.Path("/root/reference/litfass/data/wada_values.npy")
    if not ref_path.exists():
        pytest.skip("reference table not mounted")
    ref = np.load(ref_path)
    ours = snr.g_table()
    assert np.max(np.abs(ref - ours)) < 6e-3


def test_windowed_wada_detects_noise_level():
    g = np.random.default_rng(5)
    n = 22050
    t = np.arange(n) / 22050
    # gamma-like speech proxy: sparse bursts
    clean = np.sign(g.standard_normal(n)) * g.gamma(0.4, 1.0, n)
    clean /= np.abs(clean).max()
    noisy = clean + 0.5 * g.standard_normal(n)
    snr_clean = np.asarray(snr.windowed_wada(jnp.asarray(clean)))
    snr_noisy = np.asarray(snr.windowed_wada(jnp.asarray(noisy)))
    assert np.nanmean(snr_clean) > np.nanmean(snr_noisy)


def test_pitch_tracks_a_sine():
    sr = 22050
    t = np.arange(sr) / sr
    for f0 in (110.0, 220.0, 440.0):
        sig = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        f0_track = np.asarray(pitch.track(jnp.asarray(sig), sr))
        voiced = f0_track[f0_track > 0]
        assert len(voiced) > 0.8 * len(f0_track)
        assert abs(np.median(voiced) - f0) < 0.02 * f0


def test_pitch_rejects_noise():
    g = np.random.default_rng(6)
    sig = g.standard_normal(22050).astype(np.float32)
    f0_track = np.asarray(pitch.track(jnp.asarray(sig), 22050))
    # mostly unvoiced on white noise
    assert (f0_track > 0).mean() < 0.5
