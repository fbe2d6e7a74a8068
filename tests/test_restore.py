"""AudioRestorer (VoiceFixer-slot analog): declip, denoise, 2x upsample,
band replication, and the serving contract (pad/unpad, 44.1 kHz out)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.synthesis import restore


def _tone(freq, sr, dur, amp=0.8):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_stft_istft_roundtrip():
    g = np.random.default_rng(0)
    x = g.standard_normal(8192).astype(np.float32)
    y = np.asarray(restore.istft(restore.stft(jnp.asarray(x)), 8192))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_declip_rebuilds_sine_peaks():
    sr = 22050
    clean = _tone(220.0, sr, 0.25, amp=1.0)
    clipped = np.clip(clean, -0.6, 0.6) / 0.6  # hard clip, renormed
    target = clean / 0.6  # what an ideal declip would recover (scaled)
    out = np.asarray(restore.declip(jnp.asarray(clipped)))
    err_before = np.mean((clipped - target) ** 2)
    err_after = np.mean((out - target) ** 2)
    assert err_after < err_before / 3, (err_before, err_after)
    # reconstruction arches above the rail
    assert np.max(np.abs(out)) > 1.05


def test_declip_leaves_clean_audio_alone():
    sr = 22050
    clean = _tone(220.0, sr, 0.1, amp=0.7)
    out = np.asarray(restore.declip(jnp.asarray(clean)))
    np.testing.assert_allclose(out, clean, atol=2e-3)


def test_spectral_denoise_improves_snr():
    g = np.random.default_rng(1)
    sr = 22050
    clean = (
        _tone(220, sr, 0.5, 0.5) + _tone(440, sr, 0.5, 0.25)
        + _tone(880, sr, 0.5, 0.12)
    )
    noise = 0.03 * g.standard_normal(len(clean)).astype(np.float32)
    noisy = clean + noise

    def snr(x):
        return 10 * np.log10(
            np.sum(clean**2) / max(np.sum((x - clean) ** 2), 1e-12)
        )

    out = np.asarray(
        restore.spectral_denoise(
            jnp.asarray(noisy), jnp.int32(len(noisy))
        )
    )
    assert snr(out) > snr(noisy) + 6.0, (snr(noisy), snr(out))


def test_upsample_2x_preserves_tone():
    sr = 22050
    x = _tone(440.0, sr, 0.2)
    y = np.asarray(restore.upsample_2x(jnp.asarray(x)))
    assert y.shape[0] == 2 * x.shape[0]
    ref = _tone(440.0, 2 * sr, 0.2)
    # ignore edge ringing from the circular FFT resample
    s = slice(256, -256)
    corr = np.corrcoef(y[s], ref[s])[0, 1]
    assert corr > 0.999


def test_band_replication_fills_air_band():
    sr = 44100
    x = np.asarray(restore.upsample_2x(jnp.asarray(_tone(6000.0, 22050, 0.2))))
    y = np.asarray(restore.band_replicate(jnp.asarray(x)))
    spec_x = np.abs(np.fft.rfft(x)) ** 2
    spec_y = np.abs(np.fft.rfft(y)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    hi = freqs > 11500
    assert spec_y[hi].sum() > 10 * max(spec_x[hi].sum(), 1e-9)
    # fill gains decay (0.5, 0.22): HF image energy stays below the donor
    lo = (freqs > 500) & (freqs < 11000)
    assert spec_y[hi].sum() < spec_y[lo].sum()


def test_restorer_contract_and_quality():
    g = np.random.default_rng(2)
    sr = 22050
    clean = _tone(330, sr, 0.4, 0.9)
    degraded = np.clip(clean + 0.02 * g.standard_normal(len(clean)), -0.7, 0.7)
    degraded = (degraded / 0.7).astype(np.float32)
    restorer = restore.AudioRestorer()
    out = restorer(degraded, sr)
    assert restorer.output_sampling_rate == 44100
    assert out.shape[0] == 2 * len(degraded)
    assert np.isfinite(out).all()
    # quality: compare on a band-limited 44.1k reference of the clean tone
    ref = _tone(330, 44100, 0.4, 0.9) / 0.7
    s = slice(2048, -2048)

    def nmse(x):
        return np.mean((x[s] - ref[s]) ** 2) / np.mean(ref[s] ** 2)

    clipped_up = np.asarray(restore.upsample_2x(jnp.asarray(degraded)))
    assert nmse(out) < nmse(clipped_up), (nmse(out), nmse(clipped_up))


def test_restorer_resamples_non_22050_inputs():
    x = _tone(200.0, 44100, 0.1)
    out = restore.AudioRestorer()(x, 44100)
    # 44.1k in -> internally 22.05k -> restored back at 44.1k (same length)
    assert abs(out.shape[0] - len(x)) <= 2


def test_neural_denoiser_mechanics(tmp_path, monkeypatch):
    """Train the mask net briefly, round-trip weights through npz, and run
    the restoration chain with the neural stage; loss must decrease and
    the chain must stay shape/fidelity sane."""
    import numpy as np

    from lightningfastspeech2_tpu.synthesis import denoiser as dn
    from lightningfastspeech2_tpu.synthesis.restore import AudioRestorer

    rng = np.random.default_rng(0)
    t = np.arange(22050 * 2) / 22050
    clips = [
        (0.5 * np.sin(2 * np.pi * 220 * t)
         * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32),
        (0.4 * np.sign(np.sin(2 * np.pi * 110 * t))
         * np.exp(-((t % 0.3) * 8))).astype(np.float32),
    ]
    params = dn.train_denoiser(clips, steps=30, batch=2, frames=64,
                               seed=0)
    path = tmp_path / "dn.npz"
    dn.save(params, path)
    loaded = dn.load(path)
    assert loaded is not None
    import jax.numpy as jnp

    mag = jnp.asarray(rng.uniform(0, 1, (32, 513)), jnp.float32)
    a = np.asarray(dn.apply_mask_net(params, mag))
    b = np.asarray(dn.apply_mask_net(loaded, mag))
    np.testing.assert_allclose(a, b, rtol=1e-6)

    monkeypatch.setattr(dn, "BUILTIN_PATH", path)
    r = AudioRestorer(denoiser="neural")
    wav = clips[0][: 22050]
    out = r(wav, 22050)
    assert out.shape == (2 * len(wav),)
    assert np.isfinite(out).all()

    # missing weights must be a clean error, and "auto" a clean fallback
    monkeypatch.setattr(dn, "BUILTIN_PATH", tmp_path / "missing.npz")
    import pytest

    with pytest.raises(FileNotFoundError):
        AudioRestorer(denoiser="neural")
    r2 = AudioRestorer(denoiser="auto")
    assert r2._dn_params is None  # falls back to the spectral gate
