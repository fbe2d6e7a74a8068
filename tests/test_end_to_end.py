"""End-to-end smoke: synthetic corpus -> dataset -> training loop -> loss
falls; the minimum end-to-end slice of SURVEY.md §7 stage 3."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
from lightningfastspeech2_tpu.data.synthetic import make_corpus
from lightningfastspeech2_tpu.train.loop import batch_iterator, build_model, fit


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("corpus"), n_speakers=2,
                       n_utts=4, seed=1)


@pytest.fixture(scope="module")
def dataset(corpus):
    cfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0,
        speaker_type="dvector",
        stat_entries=8,
        max_phones=32,
        max_frames=256,
    )
    return TTSDataset(root=corpus, cfg=cfg)


def small_train_config() -> C.Config:
    enc = C.StackConfig(hidden=48, heads=2, layers=2, kernel_sizes=(3, 5),
                        conv_filter_size=96)
    dec = C.StackConfig(hidden=48, heads=2, layers=2, kernel_sizes=(5, 3),
                        conv_filter_size=96)
    var = C.VarianceConfig(
        variances=("pitch", "energy"),
        levels=("phone", "frame"),
        transforms=("none", "none"),
        losses=("mse", "mse"),
        nlayers=(2, 2), kernel_sizes=(3, 3), dropouts=(0.1, 0.1),
        loss_weights=(0.1, 0.1), filter_size=48, nbins=32,
    )
    model = C.ModelConfig(
        encoder=enc, decoder=dec, variance=var,
        duration=C.DurationConfig(nlayers=2, filter_size=48),
        speaker_type="dvector",
        max_phones=32, max_frames=256,
    )
    train = C.TrainConfig(lr=2e-3, warmup_steps=20, batch_size=4,
                          grad_accum=1, bf16=False, log_every=5)
    return C.Config(model=model, train=train)


def test_batch_iterator_shapes(dataset):
    it = batch_iterator(dataset, batch_size=4, epochs=1)
    batch = next(it)
    assert batch["phones"].shape[0] == 4
    assert batch["mel"].shape[2] == 80


def test_fit_loss_decreases(dataset):
    cfg = small_train_config()
    logs = []
    result = fit(cfg, dataset, max_steps=40,
                 log_fn=lambda s, m: logs.append((s, m["total"])))
    first = np.mean([l for _, l in logs[:2]])
    last = np.mean([l for _, l in logs[-2:]])
    assert np.isfinite(last)
    assert last < first, f"loss did not fall: {logs}"


def test_fit_with_grad_accum(dataset):
    cfg = small_train_config()
    cfg = C.replace(cfg, **{"train.grad_accum": 2, "train.batch_size": 2})
    result = fit(cfg, dataset, max_steps=3)
    assert np.isfinite(result.history[-1]["total"])


def test_overfit_single_batch_mel(dataset):
    """The MVP criterion: the model can overfit mel on a tiny corpus."""
    cfg = small_train_config()
    cfg = C.replace(cfg, **{"train.lr": 5e-3, "train.warmup_steps": 30})
    logs = []
    fit(cfg, dataset, max_steps=120,
        log_fn=lambda s, m: logs.append(m["mel"]))
    assert logs[-1] < 0.6 * logs[0], f"mel loss: {logs[0]:.3f} -> {logs[-1]:.3f}"


def test_fit_with_cwt_pitch(corpus):
    """CWT-transformed pitch variance through the whole pipeline:
    dataset decomposition -> collation -> model spectrogram losses."""
    dcfg = DataConfig(
        variances=("pitch",),
        variance_levels=("frame",),
        variance_transforms=("cwt",),
        augment_duration=0.0,
        speaker_type="dvector",
        stat_entries=4,
        max_phones=32,
        max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    var = C.VarianceConfig(
        variances=("pitch",), levels=("frame",), transforms=("cwt",),
        losses=("mse",), nlayers=(2,), kernel_sizes=(3,), dropouts=(0.1,),
        loss_weights=(0.1,), filter_size=48, nbins=32,
    )
    cfg = C.replace(cfg, **{"model.variance": var})
    result = fit(cfg, ds, max_steps=3)
    last = result.history[-1]
    for key in ("pitch_cwt", "pitch_mean", "pitch_std", "mel", "total"):
        assert key in last and np.isfinite(last[key]), (key, last)


def test_fit_with_soft_dtw_mel_loss(dataset):
    """soft-DTW as the mel training loss (reference loss.py:69-78 chunked
    path) through the jitted train step."""
    cfg = small_train_config()
    cfg = C.replace(cfg, **{
        "train.mel_loss": "soft_dtw",
        "train.soft_dtw_gamma": 0.1,
        "train.soft_dtw_chunk_size": 128,
    })
    result = fit(cfg, dataset, max_steps=2)
    assert np.isfinite(result.history[-1]["mel"])
    assert np.isfinite(result.history[-1]["total"])


def test_fit_with_stochastic_duration(dataset):
    """Flow-based duration predictor through the jitted train step."""
    cfg = small_train_config()
    cfg = C.replace(cfg, **{
        "model.duration": C.DurationConfig(
            nlayers=2, stochastic=True, filter_size=48, dropout=0.1,
        ),
    })
    result = fit(cfg, dataset, max_steps=2)
    assert np.isfinite(result.history[-1]["duration"])
    assert np.isfinite(result.history[-1]["total"])


def test_fit_with_fastdiff_variances(corpus):
    """Diffusion variance adaptor (frame-level only, like the reference)
    through the train loop — needs a frame-level dataset."""
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, max_phones=32, max_frames=256,
    )
    dataset = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    var = C.VarianceConfig(
        variances=("pitch", "energy"), levels=("frame", "frame"),
        transforms=("none", "none"), losses=("mse", "mse"), nlayers=(2, 2),
        kernel_sizes=(3, 3), dropouts=(0.1, 0.1), loss_weights=(0.1, 0.1),
        filter_size=48, nbins=32,
    )
    cfg = C.replace(cfg, **{
        "model.variance": var,
        "model.fastdiff_variances": True,
    })
    result = fit(cfg, dataset, max_steps=2)
    last = result.history[-1]
    for key in ("pitch", "energy", "duration", "mel", "total"):
        assert key in last and np.isfinite(last[key]), (key, last)


def test_fit_vanilla_convs(dataset):
    """BASELINE config #1 style: non-depthwise (original FastSpeech2)
    convolutions through the train loop."""
    cfg = small_train_config()
    cfg = C.replace(cfg, **{
        "model.encoder": C.replace(cfg.model.encoder, depthwise=False),
        "model.decoder": C.replace(cfg.model.decoder, depthwise=False),
        "model.variance": C.replace(cfg.model.variance, depthwise=False),
        "model.duration": C.replace(cfg.model.duration, depthwise=False),
    })
    result = fit(cfg, dataset, max_steps=2)
    assert np.isfinite(result.history[-1]["total"])


def test_fit_bf16(dataset):
    """bf16 activation policy (the flagship training precision)."""
    cfg = small_train_config()
    cfg = C.replace(cfg, **{"train.bf16": True})
    result = fit(cfg, dataset, max_steps=2)
    assert np.isfinite(result.history[-1]["total"])


def test_fit_bf16_moments(dataset):
    """bf16 first-moment optimizer state: mu stored in bfloat16, training
    still converges on finite losses."""
    import jax

    cfg = small_train_config()
    cfg = C.replace(cfg, **{"train.bf16_moments": True})
    result = fit(cfg, dataset, max_steps=3)
    assert np.isfinite(result.history[-1]["total"])
    adam_state = [
        s for s in jax.tree_util.tree_leaves(
            result.state.opt_state,
            is_leaf=lambda x: hasattr(x, "mu"),
        )
        if hasattr(s, "mu")
    ]
    assert adam_state, "no ScaleByAdamState found in opt_state"
    mu_leaf = jax.tree_util.tree_leaves(adam_state[0].mu)[0]
    nu_leaf = jax.tree_util.tree_leaves(adam_state[0].nu)[0]
    import jax.numpy as jnp

    assert mu_leaf.dtype == jnp.bfloat16
    assert nu_leaf.dtype == jnp.float32
