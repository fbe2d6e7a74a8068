"""Joint acoustic + FastDiff vocoder training path, diffusion variance
integration in the full model, and diffusion speakers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2, make_dummy_batch,
)
from lightningfastspeech2_tpu.models.joint import (
    JointFastSpeech2FastDiff,
    schedule_probability,
)
from lightningfastspeech2_tpu.train.losses import compute_losses
from lightningfastspeech2_tpu.vocoder.fastdiff import FastDiffConfig
from tests.test_model import tiny_config


def _rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": k, "dropout": jax.random.fold_in(k, 1),
            "sdp": jax.random.fold_in(k, 2)}


def test_fastdiff_variances_in_full_model():
    cfg = tiny_config(fastdiff_variances=True)
    var = C.replace(cfg.model.variance,
                    levels=("frame", "frame"))  # diffusion adaptor: frame only
    cfg = C.replace(cfg, **{"model.variance": var})
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 2, 8).items()}
    params = model.init(_rngs(), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True,
                      rngs={"sdp": jax.random.PRNGKey(9)})
    assert "variances_pitch_z" in out and "duration_z" in out
    losses = compute_losses(out, batch, cfg)
    assert {"pitch", "energy", "duration", "mel", "total"} <= set(losses)
    assert np.isfinite(float(losses["total"]))

    out_inf = model.apply(params, batch, inference=True, deterministic=True,
                          rngs={"sdp": jax.random.PRNGKey(10)})
    assert np.isfinite(np.asarray(out_inf["mel"])).all()


def test_fastdiff_speakers_in_full_model():
    cfg = tiny_config(fastdiff_speakers=True)
    model = FastSpeech2(cfg.model)
    batch = make_dummy_batch(cfg.model, 2, 8)
    batch["utterance_dvec"] = np.random.default_rng(0).standard_normal(
        (2, cfg.model.dvector_dim)
    ).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(_rngs(), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True,
                      rngs={"sdp": jax.random.PRNGKey(4)})
    assert out["speaker_pred"].shape == (2, cfg.model.dvector_dim)
    losses = compute_losses(out, batch, cfg)
    assert "speakers" in losses


def test_joint_vocoder_training():
    cfg = tiny_config(fastdiff_vocoder=True)
    fd_cfg = FastDiffConfig(
        inner_channels=8, cond_channels=80, upsample_ratios=(4, 2, 2),
        lvc_layers_each_block=2, kpnet_hidden_channels=8, T=50,
    )
    hop = fd_cfg.hop_length
    model = JointFastSpeech2FastDiff(cfg.model, fd_cfg)
    batch = make_dummy_batch(cfg.model, 2, 8)
    batch["wav"] = np.random.default_rng(1).standard_normal(
        (2, cfg.model.max_frames * hop)
    ).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(_rngs(), batch, deterministic=True)
    out = model.apply(params, batch, deterministic=True, schedule_p=0.5,
                      rngs={"sdp": jax.random.PRNGKey(5)})
    eps, z = out["fastdiff"]
    T = cfg.model.max_frames - 2
    assert eps.shape == (2, T * hop)
    losses = compute_losses(out, batch, cfg)
    assert "fastdiff" in losses
    assert np.isfinite(float(losses["total"]))


def test_schedule_probability():
    cfg = tiny_config(
        fastdiff_schedule=(0.0, 0.5, 1.0), fastdiff_schedule_end=3
    ).model
    assert schedule_probability(cfg, 0) == 0.0
    assert schedule_probability(cfg, 1) == 0.5
    assert schedule_probability(cfg, 2) == 1.0
    assert schedule_probability(cfg, 10) == 1.0  # past end -> last entry
