"""Native C++ DIO/StoneMask pitch: accuracy on synthetic signals and
agreement with the JAX YIN tracker."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.native import dio_pitch


def harmonic(sr, f0, dur=1.0, n_harm=6, vibrato_hz=0.0, vibrato_cents=0.0):
    t = np.arange(int(sr * dur)) / sr
    if vibrato_hz > 0:
        inst = f0 * 2 ** (
            vibrato_cents / 1200 * np.sin(2 * np.pi * vibrato_hz * t)
        )
        phase = 2 * np.pi * np.cumsum(inst) / sr
    else:
        phase = 2 * np.pi * f0 * t
    sig = sum(np.sin(k * phase) / k for k in range(1, n_harm + 1))
    return (sig / np.abs(sig).max()).astype(np.float64)


@pytest.mark.parametrize("f0", [110.0, 220.0, 330.0])
def test_dio_pure_and_harmonic_tones(f0):
    sr = 22050
    wav = harmonic(sr, f0)
    track = dio_pitch(wav, sr)
    voiced = track[track > 0]
    assert len(voiced) > 0.7 * len(track)
    err = abs(np.median(voiced) - f0) / f0
    assert err < 0.01, f"median {np.median(voiced)} vs {f0}"


def test_dio_vibrato_follows():
    sr = 22050
    wav = harmonic(sr, 200.0, vibrato_hz=4.0, vibrato_cents=100.0)
    track = dio_pitch(wav, sr)
    voiced = track[track > 0]
    # vibrato spans ~ +-6%: the track must actually move
    assert voiced.max() / voiced.min() > 1.05
    assert abs(np.median(voiced) - 200.0) < 6.0


def test_dio_unvoiced_on_noise():
    g = np.random.default_rng(0)
    wav = g.standard_normal(22050)
    track = dio_pitch(wav, 22050)
    assert (track > 0).mean() < 0.5


def test_stonemask_refines():
    sr = 22050
    wav = harmonic(sr, 237.0)  # off-grid f0
    coarse = dio_pitch(wav, sr, refine=False)
    refined = dio_pitch(wav, sr, refine=True)
    cv = coarse[coarse > 0]
    rv = refined[refined > 0]
    err_c = abs(np.median(cv) - 237.0)
    err_r = abs(np.median(rv) - 237.0)
    assert err_r <= err_c + 0.5
    assert err_r < 2.0


def test_agreement_with_jax_yin():
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.audio import pitch as jpitch

    sr = 22050
    wav = harmonic(sr, 180.0)
    cxx = dio_pitch(wav, sr)
    yin = np.asarray(jpitch.track(jnp.asarray(wav.astype(np.float32)), sr))
    n = min(len(cxx), len(yin))
    both = (cxx[:n] > 0) & (yin[:n] > 0)
    assert both.mean() > 0.5
    rel = np.abs(cxx[:n][both] - yin[:n][both]) / yin[:n][both]
    assert np.median(rel) < 0.02
