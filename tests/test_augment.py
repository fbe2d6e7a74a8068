"""Waveform augmentations + debug utilities."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.synthesis import augment


def sine(sr=22050, f=220.0, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * f * t).astype(np.float32)


def dominant_freq(wav, sr):
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    return np.fft.rfftfreq(len(wav), 1 / sr)[np.argmax(spec)]


def test_pitch_shift_changes_f0_keeps_length():
    sr = 22050
    wav = sine(sr)
    shift = augment.PitchShift(min_semitones=4, max_semitones=4, p=1.0)
    out = shift(wav, sr, np.random.default_rng(0))
    assert len(out) == len(wav)
    f_out = dominant_freq(out, sr)
    expected = 220 * 2 ** (4 / 12)
    assert abs(f_out - expected) < 10


def test_gaussian_snr_level():
    sr = 22050
    wav = sine(sr)
    aug = augment.AddGaussianSNR(min_snr_db=10, max_snr_db=10, p=1.0)
    out = aug(wav, sr, np.random.default_rng(1))
    noise = out - wav
    snr = 10 * np.log10(np.mean(wav**2) / np.mean(noise**2))
    assert abs(snr - 10) < 1.0


def test_room_simulator_adds_tail_energy():
    sr = 22050
    wav = np.zeros(sr, np.float32)
    wav[: sr // 50] = 1.0  # click
    aug = augment.RoomSimulator(min_target_rt60=0.4, max_target_rt60=0.4, p=1.0)
    out = aug(wav, sr, np.random.default_rng(2))
    assert len(out) == len(wav)
    # energy after the click grows vs the dry signal
    assert np.sum(out[sr // 10 :] ** 2) > np.sum(wav[sr // 10 :] ** 2)


def test_compose_and_from_args():
    sr = 22050
    wav = sine(sr)
    chain = augment.from_args(pitch_shift=True, gaussian_snr=True, room=False,
                              seed=0, gaussian_snr_min_snr_db=20,
                              gaussian_snr_max_snr_db=20)
    out = chain(wav, sr)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()
    assert augment.from_args() is None


def test_nan_guard_and_annotate():
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.utils.debug import annotate, nan_guard

    def f(x):
        return jnp.log(x)

    guarded = nan_guard(jax.jit(f), enabled=True)
    np.testing.assert_allclose(float(guarded(jnp.asarray(1.0))), 0.0)
    with pytest.raises(Exception):
        guarded(jnp.asarray(-1.0))  # NaN from log of negative

    with annotate("test-scope"):
        pass
