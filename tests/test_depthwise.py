"""Shift-multiply depthwise/grouped convs vs XLA's native grouped conv."""

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.ops.depthwise import (
    depthwise_conv1d,
    grouped_conv1d,
)


def native_grouped(x, w_kgio, b, groups):
    """lax grouped conv with the same weight layout."""
    k, G, ci, co = w_kgio.shape
    # lax wants (k, in_per_group, out_total) with feature_group_count
    w = jnp.transpose(w_kgio, (0, 2, 1, 3)).reshape(k, ci, G * co)
    out = jax.lax.conv_general_dilated(
        x, w, (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return out + b[None, None, :]


def test_depthwise_matches_native():
    g = np.random.default_rng(0)
    B, T, C, k = 2, 37, 8, 5
    x = jnp.asarray(g.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(g.standard_normal((k, C)), jnp.float32)
    b = jnp.asarray(g.standard_normal(C), jnp.float32)
    ours = depthwise_conv1d(x, w, b)
    ref = native_grouped(x, w[:, :, None, None].transpose(0, 1, 2, 3).reshape(k, C, 1, 1), b, C)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_depthwise_even_kernel_asymmetric_padding():
    # torch 'same' pads (k-1)//2 left, k//2 right for even kernels
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 10, 4)), jnp.float32)
    w = jnp.asarray(g.standard_normal((4, 4)), jnp.float32)
    ours = depthwise_conv1d(x, w, None)
    # manual: y[t] = sum_j w[j] * xpad[t+j], lpad=1, rpad=2
    xp = np.pad(np.asarray(x), ((0, 0), (1, 2), (0, 0)))
    ref = sum(xp[:, j : j + 10] * np.asarray(w)[j] for j in range(4))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_grouped_matches_native():
    g = np.random.default_rng(2)
    B, T, G, ci, co, k = 2, 21, 4, 3, 5, 3
    x = jnp.asarray(g.standard_normal((B, T, G * ci)), jnp.float32)
    w = jnp.asarray(g.standard_normal((k, G, ci, co)), jnp.float32)
    b = jnp.asarray(g.standard_normal(G * co), jnp.float32)
    ours = grouped_conv1d(x, w, b)
    ref = native_grouped(x, w, b, G)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
