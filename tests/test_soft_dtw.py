"""Soft-DTW: JAX wavefront vs brute-force numpy DP vs native C++."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.native import softdtw_cpu, softdtw_grad_cpu
from lightningfastspeech2_tpu.ops.soft_dtw import (
    pairwise_sqdist,
    soft_dtw,
    soft_dtw_batch,
    soft_dtw_from_dist,
)


def numpy_soft_dtw(D, gamma):
    """Straightforward O(N*M) reference DP."""
    n, m = D.shape
    R = np.full((n + 1, m + 1), np.inf)
    R[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            vals = np.array([R[i - 1, j], R[i, j - 1], R[i - 1, j - 1]])
            mx = np.max(-vals / gamma)
            soft = -gamma * (np.log(np.sum(np.exp(-vals / gamma - mx))) + mx)
            R[i, j] = D[i - 1, j - 1] + soft
    return R[n, m]


@pytest.mark.parametrize("gamma", [1.0, 0.1, 0.01])
@pytest.mark.parametrize("shape", [(8, 8), (12, 7), (5, 16)])
def test_jax_matches_numpy_dp(gamma, shape):
    g = np.random.default_rng(0)
    D = np.abs(g.standard_normal(shape)) + 0.1
    ref = numpy_soft_dtw(D, gamma)
    ours = float(soft_dtw_from_dist(jnp.asarray(D, jnp.float32), gamma))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_cpp_matches_numpy_dp():
    g = np.random.default_rng(1)
    x = g.standard_normal((10, 4))
    y = g.standard_normal((13, 4))
    D = ((x[:, None] - y[None, :]) ** 2).sum(-1)
    for gamma in (1.0, 0.01):
        ref = numpy_soft_dtw(D, gamma)
        ours = softdtw_cpu(x, y, gamma)
        np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_jax_matches_cpp_and_gradients():
    import jax

    g = np.random.default_rng(2)
    x = g.standard_normal((9, 3)).astype(np.float32)
    y = g.standard_normal((9, 3)).astype(np.float32)
    gamma = 0.5
    v_jax = float(soft_dtw(jnp.asarray(x), jnp.asarray(y), gamma=gamma))
    v_cpp = softdtw_cpu(x, y, gamma)
    np.testing.assert_allclose(v_jax, v_cpp, rtol=1e-4)

    # JAX autodiff grad wrt x matches the C++ E-matrix chain rule:
    # dV/dx = sum_j E[i,j] * 2 (x_i - y_j)
    grad_jax = jax.grad(
        lambda a: soft_dtw(a, jnp.asarray(y), gamma=gamma)
    )(jnp.asarray(x))
    _, E = softdtw_grad_cpu(x, y, gamma)
    grad_ref = 2.0 * (E.sum(1)[:, None] * x - E @ y)
    np.testing.assert_allclose(np.asarray(grad_jax), grad_ref, atol=1e-3)


def test_normalized_mode_zero_on_identical():
    g = np.random.default_rng(3)
    x = g.standard_normal((12, 5)).astype(np.float32)
    v = float(soft_dtw(jnp.asarray(x), jnp.asarray(x), gamma=0.1,
                       normalize=True))
    np.testing.assert_allclose(v, 0.0, atol=1e-3)
    assert softdtw_cpu(x, x, 0.1, normalize=True) == pytest.approx(0.0, abs=1e-6)


def test_batched():
    g = np.random.default_rng(4)
    x = g.standard_normal((3, 7, 2)).astype(np.float32)
    y = g.standard_normal((3, 7, 2)).astype(np.float32)
    out = soft_dtw_batch(jnp.asarray(x), jnp.asarray(y), gamma=0.1)
    assert out.shape == (3,)
    for b in range(3):
        np.testing.assert_allclose(
            float(out[b]), float(soft_dtw(jnp.asarray(x[b]), jnp.asarray(y[b]),
                                          gamma=0.1)), rtol=1e-5)
