"""SRMR: clean speech-like signals must score higher than reverberant
ones; frame interpolation contract; dataset integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.audio.srmr import (
    erb_space,
    frame_srmr,
    gammatone_fir,
    srmr_per_window,
)


def am_speech_like(n, sr, rng, mod_rate=5.0):
    """Carrier with strong slow amplitude modulation (speech-like)."""
    t = np.arange(n) / sr
    carrier = np.sin(2 * np.pi * 500 * t) + 0.5 * np.sin(2 * np.pi * 1500 * t)
    envelope = 0.5 * (1 + np.sin(2 * np.pi * mod_rate * t))
    return (carrier * envelope + 0.01 * rng.standard_normal(n)).astype(np.float32)


def reverberate(wav, sr, rt60=1.0, rng=None):
    """Exponential-decay noise impulse response."""
    n_ir = int(rt60 * sr)
    t = np.arange(n_ir) / sr
    ir = (rng.standard_normal(n_ir) * np.exp(-6.9 * t / rt60)).astype(np.float32)
    ir /= np.sqrt((ir**2).sum())
    out = np.convolve(wav, ir)[: len(wav)]
    return (out / np.abs(out).max()).astype(np.float32)


def test_erb_space_monotone():
    cfs = erb_space(125.0, 8000.0, 23)
    assert len(cfs) == 23
    assert (np.diff(cfs) > 0).all()
    assert abs(cfs[0] - 125.0) < 1.0


def test_gammatone_fir_shape():
    firs = gammatone_fir(22050)
    assert firs.shape == (23, 512)
    np.testing.assert_allclose((firs**2).sum(axis=1), 1.0, rtol=1e-4)


def test_srmr_clean_beats_reverberant():
    sr = 22050
    rng = np.random.default_rng(0)
    clean = am_speech_like(sr * 2, sr, rng)
    reverb = reverberate(clean, sr, rt60=1.0, rng=rng)
    srmr_clean = float(np.mean(np.asarray(srmr_per_window(jnp.asarray(clean), sr))))
    srmr_reverb = float(np.mean(np.asarray(srmr_per_window(jnp.asarray(reverb), sr))))
    assert np.isfinite(srmr_clean) and np.isfinite(srmr_reverb)
    assert srmr_clean > srmr_reverb


def test_frame_interpolation():
    sr = 22050
    rng = np.random.default_rng(1)
    wav = am_speech_like(sr, sr, rng)
    out = frame_srmr(wav, 87, sr)
    assert out.shape == (87,)
    assert np.isfinite(out).all()


def test_dataset_with_srmr_variance(tmp_path):
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from lightningfastspeech2_tpu.data.synthetic import make_corpus

    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=2, seed=7)
    cfg = DataConfig(
        variances=("energy", "srmr"),
        variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, stat_entries=2,
        max_phones=64, max_frames=512,
    )
    ds = TTSDataset(root=corpus, cfg=cfg)
    item = ds[0]
    assert item["variances_srmr"].shape[0] == int(item["duration"].sum())
    assert np.isfinite(item["variances_srmr"]).all()
    assert "srmr" in ds.stats
