"""Stochastic duration predictor: spline invertibility, flow round-trips,
NLL training path, and the full model with duration.stochastic=True."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.models.sdp import (
    ConvFlow,
    DilatedDepthSeparableConv,
    ElementwiseAffine,
    StochasticDurationPredictor,
)
from lightningfastspeech2_tpu.ops.splines import rational_quadratic_spline


def _random_spline_params(shape, K, rng):
    return (
        jnp.asarray(rng.standard_normal(shape + (K,)), jnp.float32),
        jnp.asarray(rng.standard_normal(shape + (K,)), jnp.float32),
        jnp.asarray(rng.standard_normal(shape + (K - 1,)), jnp.float32),
    )


def test_spline_forward_inverse_roundtrip():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.uniform(-8, 8, (64,)), jnp.float32)  # inside + tails
    uw, uh, ud = _random_spline_params((64,), 10, g)
    y, ld = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x2, ld_inv = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)


def test_spline_identity_outside_tails():
    g = np.random.default_rng(1)
    x = jnp.asarray([-7.0, 6.0, 5.5])
    uw, uh, ud = _random_spline_params((3,), 10, g)
    y, ld = rational_quadratic_spline(x, uw, uh, ud)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ld), 0.0)


def test_spline_logdet_matches_finite_difference():
    g = np.random.default_rng(2)
    x = jnp.asarray(g.uniform(-4, 4, (32,)), jnp.float32)
    uw, uh, ud = _random_spline_params((32,), 10, g)
    eps = 1e-3
    y0, ld = rational_quadratic_spline(x, uw, uh, ud)
    y1, _ = rational_quadratic_spline(x + eps, uw, uh, ud)
    fd = np.log(np.abs((np.asarray(y1) - np.asarray(y0)) / eps))
    np.testing.assert_allclose(np.asarray(ld), fd, atol=5e-2)


def test_conv_flow_invertible():
    g = np.random.default_rng(3)
    B, T = 2, 12
    x = jnp.asarray(g.standard_normal((B, T, 2)), jnp.float32)
    mask = jnp.ones((B, T), bool)
    flow = ConvFlow(2, 16, 3, 2)
    params = flow.init(jax.random.PRNGKey(0), x, mask)
    y, logdet = flow.apply(params, x, mask)
    x2 = flow.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # zero-initialized projection -> near-identity at init is NOT expected
    # (interior derivatives are softplus(0)), but logdet must be finite
    assert np.isfinite(np.asarray(logdet)).all()


def test_elementwise_affine_invertible():
    g = np.random.default_rng(4)
    x = jnp.asarray(g.standard_normal((2, 5, 2)), jnp.float32)
    mask = jnp.ones((2, 5), bool)
    aff = ElementwiseAffine(2)
    params = aff.init(jax.random.PRNGKey(0), x, mask)
    # perturb params so it's not the identity
    params = jax.tree_util.tree_map(lambda p: p + 0.3, params)
    y, logdet = aff.apply(params, x, mask)
    x2 = aff.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


def test_sdp_training_and_inference():
    g = np.random.default_rng(5)
    B, T, C = 2, 16, 32
    x = jnp.asarray(g.standard_normal((B, T, C)), jnp.float32)
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([16, 10])[:, None])
    durations = jnp.asarray(g.integers(1, 9, (B, T)), jnp.float32)

    sdp = StochasticDurationPredictor(C, 64, 3, 0.1, n_flows=2)
    params = sdp.init(
        {"params": jax.random.PRNGKey(0), "sdp": jax.random.PRNGKey(1)},
        x, mask, durations,
    )
    nll = sdp.apply(params, x, mask, durations,
                    rngs={"sdp": jax.random.PRNGKey(2)})
    assert nll.shape == (B,)
    assert np.isfinite(np.asarray(nll)).all()

    logw = sdp.apply(params, x, mask, None, reverse=True,
                     rngs={"sdp": jax.random.PRNGKey(3)})
    assert logw.shape == (B, T)
    assert np.isfinite(np.asarray(logw)).all()


def test_full_model_with_stochastic_duration():
    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2, init_params, make_dummy_batch,
    )
    from lightningfastspeech2_tpu.train.losses import compute_losses
    from tests.test_model import tiny_config

    cfg = tiny_config()
    cfg = C.replace(
        cfg, **{"model.duration": C.DurationConfig(
            nlayers=2, stochastic=True, filter_size=32)}
    )
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 2, 8).items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch, deterministic=True,
                      rngs={"sdp": jax.random.PRNGKey(1)})
    assert out["duration_prediction"].shape == (2,)  # per-item NLL
    losses = compute_losses(out, batch, cfg)
    assert np.isfinite(float(losses["total"]))

    out_inf = model.apply(params, batch, inference=True, deterministic=True,
                          rngs={"sdp": jax.random.PRNGKey(2)})
    d = np.asarray(out_inf["duration_rounded"])
    assert (d >= 0).all()
