"""FastDiff variance adaptor + speaker generator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.core.config import DurationConfig, VarianceConfig
from lightningfastspeech2_tpu.models.fastdiff_variances import (
    FastDiffSpeakerGenerator,
    FastDiffVarianceAdaptor,
    FastDiffVariancePredictor,
)
from lightningfastspeech2_tpu.models.variance_adaptor import VarianceStats


def small_adaptor():
    vcfg = VarianceConfig(
        variances=("pitch", "energy"),
        levels=("frame", "frame"),
        transforms=("none", "none"),
        losses=("mse", "mse"),
        nlayers=(2, 2), kernel_sizes=(3, 3), dropouts=(0.1, 0.1),
        loss_weights=(0.1, 0.1), filter_size=16, nbins=8,
    )
    dcfg = DurationConfig(nlayers=2, kernel_size=3, filter_size=16)
    stats = (("pitch", VarianceStats(-2, 2, 0, 1)),
             ("energy", VarianceStats(-2, 2, 0, 1)))
    return FastDiffVarianceAdaptor(
        vcfg, dcfg, hidden=16, max_frames=32, stats=stats, nbins=8,
        inference_steps=3, T=50,
    )


def _batch(B=2, P=8, T=32):
    g = np.random.default_rng(0)
    return {
        "duration": jnp.asarray(np.full((B, P), 4), jnp.int32),
        "variances_pitch": jnp.asarray(g.standard_normal((B, T)), jnp.float32),
        "variances_energy": jnp.asarray(g.standard_normal((B, T)), jnp.float32),
    }


def test_adaptor_training_path():
    adaptor = small_adaptor()
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((2, 8, 16)), jnp.float32)
    mask = jnp.ones((2, 8), bool)
    targets = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "sdp": jax.random.PRNGKey(1)}
    params = adaptor.init(rngs, x, mask, targets)
    out = adaptor.apply(params, x, mask, targets,
                        rngs={"sdp": jax.random.PRNGKey(2)})
    assert out["duration_prediction"].shape == (2, 8)
    assert out["duration_z"].shape == (2, 8)
    for var in ("pitch", "energy"):
        assert out[f"variances_{var}"].shape == (2, 32)
        assert out[f"variances_{var}_z"].shape == (2, 32)
    assert out["x"].shape == (2, 32, 16)
    # diffusion loss is MSE(noise_pred, z)
    loss = jnp.mean(
        (out["variances_pitch"] - out["variances_pitch_z"]) ** 2
    )
    assert np.isfinite(float(loss))


def test_adaptor_inference_path():
    adaptor = small_adaptor()
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((2, 8, 16)), jnp.float32)
    mask = jnp.ones((2, 8), bool)
    targets = _batch()
    rngs = {"params": jax.random.PRNGKey(0), "sdp": jax.random.PRNGKey(1)}
    params = adaptor.init(rngs, x, mask, targets)
    out = adaptor.apply(params, x, mask, None, inference=True,
                        rngs={"sdp": jax.random.PRNGKey(3)})
    d = np.asarray(out["duration_rounded"])
    assert (d >= 0).all()
    assert np.isfinite(np.asarray(out["variances_pitch"])).all()
    assert out["x"].shape == (2, 32, 16)


def test_speaker_generator_roundtrip():
    gen = FastDiffSpeakerGenerator(hidden_dim=32, c_dim=16, speaker_dim=16,
                                   inference_steps=3, T=50)
    g = np.random.default_rng(3)
    mean = jnp.asarray(g.standard_normal((4, 16)), jnp.float32)
    utt = jnp.asarray(g.standard_normal((4, 16)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "sdp": jax.random.PRNGKey(1)}
    params = gen.init(rngs, mean, utt)
    pred, z = gen.apply(params, mean, utt, rngs={"sdp": jax.random.PRNGKey(2)})
    assert pred.shape == z.shape == (4, 16)
    sample = gen.apply(params, mean, inference=True,
                       rngs={"sdp": jax.random.PRNGKey(3)})
    assert sample.shape == (4, 16)
    assert np.isfinite(np.asarray(sample)).all()
