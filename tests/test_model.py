"""Acoustic model forward/loss smoke + shape tests on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2,
    init_params,
    make_dummy_batch,
    param_count,
)
from lightningfastspeech2_tpu.train.losses import compute_losses


def tiny_config(**model_kwargs) -> C.Config:
    enc = C.StackConfig(hidden=32, heads=2, layers=2, kernel_sizes=(3, 5),
                        conv_filter_size=64)
    dec = C.StackConfig(hidden=32, heads=2, layers=2, kernel_sizes=(5, 3),
                        conv_filter_size=64)
    var = C.VarianceConfig(
        variances=("pitch", "energy"),
        levels=("phone", "frame"),
        transforms=("none", "none"),
        losses=("mse", "mse"),
        nlayers=(2, 2),
        kernel_sizes=(3, 3),
        dropouts=(0.1, 0.1),
        loss_weights=(0.1, 0.1),
        filter_size=32,
        nbins=16,
    )
    dur = C.DurationConfig(nlayers=2, filter_size=32)
    kwargs = dict(
        encoder=enc, decoder=dec, variance=var, duration=dur,
        vocab_size=50, max_phones=16, max_frames=64,
        speaker_type="dvector", n_speakers=4, dvector_dim=16,
    )
    kwargs.update(model_kwargs)
    return C.Config(model=C.ModelConfig(**kwargs))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = FastSpeech2(cfg.model)
    batch = make_dummy_batch(cfg.model, batch_size=2, n_phones=8, seed=0)
    batch["speaker"] = np.random.default_rng(0).standard_normal((2, 16)).astype(
        np.float32
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)
    return cfg, model, batch, params


def test_forward_shapes(setup):
    cfg, model, batch, params = setup
    out = model.apply(params, batch, deterministic=True)
    B = batch["phones"].shape[0]
    assert out["mel"].shape == (B, cfg.model.max_frames, cfg.model.audio.n_mels)
    assert out["duration_prediction"].shape == (B, cfg.model.max_phones)
    assert out["variances_pitch"].shape == (B, cfg.model.max_phones)
    assert out["variances_energy"].shape == (B, cfg.model.max_frames)
    assert out["frame_mask"].dtype == jnp.bool_
    # teacher-forced: frames beyond sum(durations) masked out
    total = np.asarray(batch["duration"]).sum(axis=1)
    fm = np.asarray(out["frame_mask"])
    for b in range(B):
        t = min(int(total[b]), cfg.model.max_frames)
        assert fm[b, :t].all() and not fm[b, t:].any()


def test_forward_inference_mode(setup):
    cfg, model, batch, params = setup
    out = model.apply(params, batch, inference=True, deterministic=True)
    d = np.asarray(out["duration_rounded"])
    assert (d >= 0).all()
    # pad phones must have zero duration
    pm = np.asarray(out["phone_mask"])
    assert (d[~pm] == 0).all()


def test_losses_finite_and_complete(setup):
    cfg, model, batch, params = setup
    out = model.apply(params, batch, deterministic=True)
    losses = compute_losses(out, batch, cfg)
    assert set(losses) == {"pitch", "energy", "mel", "duration", "total"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_grad_step_decreases_loss(setup):
    cfg, model, batch, params = setup

    def loss_fn(p):
        out = model.apply(p, batch, deterministic=True)
        return compute_losses(out, batch, cfg)["total"]

    l0, grads = jax.value_and_grad(loss_fn)(params)
    gnorm = jnp.sqrt(
        sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
    )
    assert np.isfinite(float(l0)) and float(gnorm) > 0
    lr = 1e-3 / max(float(gnorm), 1.0)
    p2 = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    l1 = loss_fn(p2)
    assert float(l1) < float(l0)


def test_cwt_variance_path():
    cfg = tiny_config()
    # switch pitch to cwt transform at frame level
    var = C.VarianceConfig(
        variances=("pitch",),
        levels=("frame",),
        transforms=("cwt",),
        losses=("mse",),
        nlayers=(2,),
        kernel_sizes=(3,),
        dropouts=(0.1,),
        loss_weights=(0.1,),
        filter_size=32,
        nbins=16,
    )
    cfg = C.replace(cfg, **{"model.variance": var})
    model = FastSpeech2(cfg.model, stats=(
        ("pitch", __import__("lightningfastspeech2_tpu.models.variance_adaptor",
                             fromlist=["VarianceStats"]).VarianceStats(
            min=50.0, max=500.0, mean=5.0, std=1.0)),
    ))
    batch = make_dummy_batch(cfg.model, batch_size=2, n_phones=8, seed=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch, deterministic=True)
    assert out["variances_pitch"]["spectrogram"].shape == (
        2, cfg.model.max_frames, 10
    )
    losses = compute_losses(out, batch, cfg)
    assert {"pitch_cwt", "pitch_mean", "pitch_std"} <= set(losses)
    # inference returns the recomposed signal
    out_inf = model.apply(params, batch, inference=True, deterministic=True)
    assert out_inf["variances_pitch"]["reconstructed_signal"].shape == (
        2, cfg.model.max_frames
    )


def test_id_speaker_and_priors():
    cfg = tiny_config(speaker_type="id", priors=("pitch", "duration"))
    model = FastSpeech2(cfg.model)
    batch = make_dummy_batch(cfg.model, batch_size=2, n_phones=8, seed=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_param_count_76m_config():
    """LightSpeech 76M: our default config should land in the right
    ballpark (reference README.md:10 claims 76M with >2k speakers)."""
    cfg = C.lightspeech_flagship()
    model = FastSpeech2(cfg.model)
    batch = make_dummy_batch(cfg.model, batch_size=1, n_phones=8, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)
    n = param_count(params["params"])
    assert 5e6 < n < 2e8, f"param count {n/1e6:.1f}M out of range"


def test_every_layer_embedding_paths():
    """speaker/prior embeddings re-injected at every layer — the feature
    the reference intended but broke (SURVEY 'defects to NOT replicate')."""
    cfg = tiny_config(
        speaker_embedding_every_layer=True,
        prior_embedding_every_layer=True,
        priors=("pitch",),
    )
    model = FastSpeech2(cfg.model)
    batch = make_dummy_batch(cfg.model, batch_size=2, n_phones=8, seed=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["mel"])).all()
    # changing the prior value must change the output through every layer
    batch2 = dict(batch)
    batch2["priors_pitch"] = batch["priors_pitch"] + 10.0
    out2 = model.apply(params, batch2, deterministic=True)
    assert not np.allclose(np.asarray(out["mel"]), np.asarray(out2["mel"]))
