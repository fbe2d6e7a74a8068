"""Fast LVC-gate approximations (vocoder/fastdiff.py fast_tanh /
fast_sigmoid / gated_activation): accuracy bounds and wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.vocoder.fastdiff import (
    FastDiff,
    FastDiffConfig,
    fast_sigmoid,
    fast_tanh,
    gated_activation,
)


def test_fast_tanh_error_bound():
    x = jnp.linspace(-10, 10, 4001)
    err = np.abs(np.asarray(fast_tanh(x)) - np.tanh(np.asarray(x)))
    assert err.max() < 1.2e-4, err.max()
    # near zero (where trained gates concentrate) it is much tighter
    xs = jnp.linspace(-1, 1, 1001)
    errs = np.abs(np.asarray(fast_tanh(xs)) - np.tanh(np.asarray(xs)))
    assert errs.max() < 1e-5, errs.max()


def test_fast_sigmoid_error_bound():
    x = np.linspace(-12, 12, 4001)
    err = np.abs(np.asarray(fast_sigmoid(jnp.asarray(x)))
                 - 1 / (1 + np.exp(-x)))
    assert err.max() < 6e-5, err.max()
    # saturation beyond the clamp point
    assert float(fast_sigmoid(jnp.asarray(10.0))) > 1.0 - 1e-4
    assert float(fast_sigmoid(jnp.asarray(-10.0))) < 1e-4


def test_gated_activation_exact_and_fast():
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 8)), jnp.float32
    )
    exact = gated_activation(y, 4, fast=False)
    ref = jax.nn.sigmoid(y[..., :4]) * jnp.tanh(y[..., 4:])
    np.testing.assert_allclose(np.asarray(exact), np.asarray(ref))
    fast = gated_activation(y, 4, fast=True)
    assert np.abs(np.asarray(fast) - np.asarray(ref)).max() < 2e-4


def test_fast_gating_same_params_close_output():
    """fast_gating=True reuses the exact model's params (no tree change)
    and produces a near-identical eps prediction."""
    cfg = FastDiffConfig(inner_channels=8, cond_channels=8,
                         upsample_ratios=(4, 4), lvc_layers_each_block=2,
                         kpnet_hidden_channels=8)
    model = FastDiff(cfg)
    B, T = 2, 8
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T * 16)), jnp.float32
    )
    c = jnp.asarray(
        np.random.default_rng(2).standard_normal((B, T, 8)), jnp.float32
    )
    ts = jnp.asarray([3, 7])
    params = model.init(jax.random.PRNGKey(0), x, c, ts)
    out = model.apply(params, x, c, ts)
    fast_model = FastDiff(dataclasses.replace(cfg, fast_gating=True))
    out_fast = fast_model.apply(params, x, c, ts)
    assert out.shape == out_fast.shape
    err = np.abs(np.asarray(out) - np.asarray(out_fast)).max()
    assert err < 2e-3, err  # a few stacked ~1e-4 gate errors
    assert err > 0.0  # the fast path actually engaged
