"""On-device feature extraction vs the host dataset pipeline, end-to-end
through a jitted call."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
from lightningfastspeech2_tpu.data.synthetic import make_corpus
from lightningfastspeech2_tpu.models.variance_adaptor import VarianceStats
from lightningfastspeech2_tpu.train.on_device_features import (
    augment_batch_with_features,
    extract_batch_features,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    corpus = make_corpus(tmp_path_factory.mktemp("c"), n_speakers=1,
                         n_utts=2, seed=11)
    dcfg = DataConfig(
        variances=("pitch", "energy", "snr"),
        variance_levels=("frame", "frame", "frame"),
        variance_transforms=("none", "none", "none"),
        augment_duration=0.0, stat_entries=2, load_wav=True,
        max_phones=32, max_frames=512,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = C.Config(model=C.ModelConfig(
        variance=C.VarianceConfig(
            variances=("pitch", "energy", "snr"),
            levels=("frame", "frame", "frame"),
            transforms=("none", "none", "none"),
            losses=("mse", "mse", "mse"),
            nlayers=(2, 2, 2), kernel_sizes=(3, 3, 3),
            dropouts=(0.1, 0.1, 0.1), loss_weights=(0.1, 0.1, 0.1),
        ),
        max_phones=32, max_frames=512,
    ))
    stats = tuple(
        (v, VarianceStats(**ds.stats[v])) for v in ("pitch", "energy", "snr")
    )
    return ds, cfg, stats


def test_on_device_matches_host_pipeline(setup):
    ds, cfg, stats = setup
    item = ds.__getitem__(0, augment=False)
    batch = ds.collate([item])
    T = batch["mel"].shape[1]
    hop = cfg.model.audio.hop_length

    wav = np.zeros((1, T * hop), np.float32)
    raw = item["wav"]
    wav[0, : len(raw)] = raw
    silence_phone = np.zeros((1, batch["phones"].shape[1]), bool)
    silence_phone[0, : len(item["unexpanded_silence_mask"])] = item[
        "unexpanded_silence_mask"
    ]

    feats = jax.jit(
        lambda w, d, s: extract_batch_features(w, d, s, cfg, stats, T)
    )(jnp.asarray(wav), jnp.asarray(batch["duration"]),
      jnp.asarray(silence_phone))

    n = int(item["duration"].sum())
    np.testing.assert_allclose(
        np.asarray(feats["mel"])[0, :n], batch["mel"][0, :n], atol=1e-3
    )
    for var in ("energy", "pitch", "snr"):
        got = np.asarray(feats[f"variances_{var}"])[0, :n]
        want = batch[f"variances_{var}"][0, :n]
        # identical algorithms; differences only from f32 accumulation and
        # the host's float64 interpolation
        err = np.abs(got - want)
        assert np.median(err) < 0.05, (var, np.median(err), err.max())


def test_augment_batch_inside_jit(setup):
    ds, cfg, stats = setup
    items = [ds.__getitem__(i, augment=False) for i in range(2)]
    batch = ds.collate(items)
    T = batch["mel"].shape[1]
    hop = cfg.model.audio.hop_length
    wav = np.zeros((2, T * hop), np.float32)
    for b, it in enumerate(items):
        wav[b, : len(it["wav"])] = it["wav"]
    jbatch = {
        "wav": jnp.asarray(wav),
        "duration": jnp.asarray(batch["duration"]),
        "silence_phone": jnp.zeros_like(jnp.asarray(batch["duration"]), bool),
        "phones": jnp.asarray(batch["phones"]),
    }

    @jax.jit
    def run(b):
        out = augment_batch_with_features(b, cfg, stats)
        return out["mel"], out["variances_pitch"]

    mel, pitch = run(jbatch)
    assert mel.shape == (2, T, 80)
    assert np.isfinite(np.asarray(mel)).all()
    assert np.isfinite(np.asarray(pitch)).all()


@pytest.mark.parametrize("level", ["frame", "phone"])
def test_on_device_cwt_matches_host_pipeline(tmp_path, level):
    """CWT-transformed variances extracted on-device (decompose_padded)
    match the host dataset pipeline's spectrogram/signal/mean/std."""
    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=2, seed=13)
    dcfg = DataConfig(
        variances=("pitch",),
        variance_levels=(level,),
        variance_transforms=("cwt",),
        augment_duration=0.0, stat_entries=2, load_wav=True,
        max_phones=32, max_frames=512,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = C.Config(model=C.ModelConfig(
        variance=C.VarianceConfig(
            variances=("pitch",), levels=(level,), transforms=("cwt",),
            losses=("mse",), nlayers=(2,), kernel_sizes=(3,),
            dropouts=(0.1,), loss_weights=(0.1,),
        ),
        max_phones=32, max_frames=512,
    ))
    stats = ((("pitch"), VarianceStats(**ds.stats["pitch"])),)

    item = ds.__getitem__(0, augment=False)
    batch = ds.collate([item])
    T = batch["mel"].shape[1]
    hop = cfg.model.audio.hop_length
    wav = np.zeros((1, T * hop), np.float32)
    wav[0, : len(item["wav"])] = item["wav"]
    silence_phone = np.zeros((1, batch["phones"].shape[1]), bool)
    silence_phone[0, : len(item["unexpanded_silence_mask"])] = item[
        "unexpanded_silence_mask"
    ]
    phones_lengths = np.asarray([len(item["phones"])])

    feats = jax.jit(
        lambda w, d, s, p: extract_batch_features(w, d, s, cfg, stats, T, p)
    )(jnp.asarray(wav), jnp.asarray(batch["duration"]),
      jnp.asarray(silence_phone), jnp.asarray(phones_lengths))

    n = (len(item["phones"]) if level == "phone"
         else int(item["duration"].sum()))
    got_sig = np.asarray(feats["variances_pitch_signal"])[0, :n]
    want_sig = batch["variances_pitch_signal"][0, :n]
    assert np.median(np.abs(got_sig - want_sig)) < 0.05
    got_spec = np.asarray(feats["variances_pitch_spectrogram"])[0, :n]
    want_spec = batch["variances_pitch_spectrogram"][0, :n]
    # same algorithm; differences only where f32 YIN pitch differs from the
    # host's f64 track near voicing boundaries
    assert np.median(np.abs(got_spec - want_spec)) < 0.05
    np.testing.assert_allclose(
        float(feats["variances_pitch_mean"][0]),
        batch["variances_pitch_mean"][0], atol=0.2,
    )


def test_raw_mode_training_cwt(tmp_path):
    """Raw-mode training with a CWT variance: features (incl. the CWT
    decomposition) extracted inside the jitted step, losses finite."""
    from lightningfastspeech2_tpu.train.loop import fit
    from tests.test_end_to_end import small_train_config

    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=4, seed=29)
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("frame", "frame"),
        variance_transforms=("cwt", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, raw_mode=True,
        max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    var = C.VarianceConfig(
        variances=("pitch", "energy"), levels=("frame", "frame"),
        transforms=("cwt", "none"), losses=("mse", "mse"), nlayers=(2, 2),
        kernel_sizes=(3, 3), dropouts=(0.1, 0.1), loss_weights=(0.1, 0.1),
        filter_size=48, nbins=32,
    )
    cfg = C.replace(cfg, **{
        "model.variance": var,
        "train.on_device_features": True,
    })
    result = fit(cfg, ds, max_steps=3)
    last = result.history[-1]
    for key in ("pitch_cwt", "pitch_mean", "pitch_std", "energy", "mel",
                "duration", "total"):
        assert key in last and np.isfinite(last[key]), (key, last)


def test_raw_mode_training_end_to_end(tmp_path):
    """Full on-device-features training: raw-wav batches, features
    extracted inside the jitted step."""
    from lightningfastspeech2_tpu.data.synthetic import make_corpus
    from lightningfastspeech2_tpu.train.loop import fit
    from tests.test_end_to_end import small_train_config

    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=4, seed=21)
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, raw_mode=True,
        max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    item = ds[0]
    assert "mel" not in item and "wav" in item  # raw items are cheap

    cfg = small_train_config()
    var = C.VarianceConfig(
        variances=("pitch", "energy"), levels=("frame", "frame"),
        transforms=("none", "none"), losses=("mse", "mse"), nlayers=(2, 2),
        kernel_sizes=(3, 3), dropouts=(0.1, 0.1), loss_weights=(0.1, 0.1),
        filter_size=48, nbins=32,
    )
    cfg = C.replace(cfg, **{
        "model.variance": var,
        "train.on_device_features": True,
    })
    result = fit(cfg, ds, max_steps=3)
    last = result.history[-1]
    for key in ("pitch", "energy", "mel", "duration", "total"):
        assert key in last and np.isfinite(last[key]), (key, last)


def test_raw_mode_evaluate(tmp_path):
    """ADVICE r1 (high): evaluate() must extract on-device features for
    raw-mode batches instead of KeyError'ing on 'mel'."""
    from lightningfastspeech2_tpu.train.loop import build_model, evaluate, fit
    from tests.test_end_to_end import small_train_config

    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=4, seed=23)
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, raw_mode=True,
        max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    var = C.VarianceConfig(
        variances=("pitch", "energy"), levels=("frame", "frame"),
        transforms=("none", "none"), losses=("mse", "mse"), nlayers=(2, 2),
        kernel_sizes=(3, 3), dropouts=(0.1, 0.1), loss_weights=(0.1, 0.1),
        filter_size=48, nbins=32,
    )
    cfg = C.replace(cfg, **{
        "model.variance": var,
        "train.on_device_features": True,
    })
    result = fit(cfg, ds, max_steps=2)
    model = build_model(cfg, ds)
    metrics = evaluate(cfg, ds, model, result.state.params, max_batches=1)
    for key in ("eval/mel_loss", "eval/mae_pitch", "eval/mae_mel",
                "eval/jensenshannon_energy"):
        assert key in metrics, sorted(metrics)


def test_on_device_srmr_matches_host(tmp_path):
    """SRMR on the device path (frame_srmr_padded: padded-Hilbert +
    static-shape window interp) vs the host's frame_srmr. Tolerance
    covers the documented padded-vs-exact Hilbert deviation and the
    frames*hop wav-length approximation."""
    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=2, seed=13)
    dcfg = DataConfig(
        variances=("energy", "srmr"),
        variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, stat_entries=2, load_wav=True,
        max_phones=32, max_frames=512,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = C.Config(model=C.ModelConfig(
        variance=C.VarianceConfig(
            variances=("energy", "srmr"),
            levels=("frame", "frame"),
            transforms=("none", "none"),
            losses=("mse", "mse"),
            nlayers=(2, 2), kernel_sizes=(3, 3),
            dropouts=(0.1, 0.1), loss_weights=(0.1, 0.1),
        ),
        max_phones=32, max_frames=512,
    ))
    stats = tuple(
        (v, VarianceStats(**ds.stats[v])) for v in ("energy", "srmr")
    )
    item = ds.__getitem__(0, augment=False)
    batch = ds.collate([item])
    T = batch["mel"].shape[1]
    hop = cfg.model.audio.hop_length
    wav = np.zeros((1, T * hop), np.float32)
    raw = item["wav"]
    wav[0, : len(raw)] = raw
    silence_phone = np.zeros((1, batch["phones"].shape[1]), bool)
    silence_phone[0, : len(item["unexpanded_silence_mask"])] = item[
        "unexpanded_silence_mask"
    ]
    feats = jax.jit(
        lambda w, d, s: extract_batch_features(w, d, s, cfg, stats, T)
    )(jnp.asarray(wav), jnp.asarray(batch["duration"]),
      jnp.asarray(silence_phone))
    n = int(item["duration"].sum())
    got = np.asarray(feats["variances_srmr"])[0, :n]
    want = batch["variances_srmr"][0, :n]
    err = np.abs(got - want)
    assert np.median(err) < 0.1, (np.median(err), err.max())
