"""Pallas soft-DTW wavefront kernel vs the lax.scan path (interpret mode
on CPU; compiled parity is exercised on real TPU by scripts/bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.ops import soft_dtw as sdtw
from lightningfastspeech2_tpu.ops.pallas_soft_dtw import (
    skew,
    soft_dtw_from_dist_pallas,
    unskew,
)


def test_skew_unskew_roundtrip():
    g = np.random.default_rng(0)
    a = g.standard_normal((5, 9)).astype(np.float32)
    s = skew(jnp.asarray(a), 128, fill=-1.0)
    assert s.shape == (13, 128)
    np.testing.assert_allclose(np.asarray(unskew(s, 5, 9)), a)
    # skewed diagonals really are anti-diagonals
    assert float(s[3, 2]) == a[2, 1]


@pytest.mark.parametrize("shape", [(16, 16), (48, 32), (31, 57), (128, 128)])
@pytest.mark.parametrize("gamma", [1.0, 0.1])
def test_value_matches_scan_path(shape, gamma):
    g = np.random.default_rng(1)
    D = jnp.asarray(np.abs(g.standard_normal(shape)).astype(np.float32))
    want = float(sdtw.soft_dtw_from_dist(D, gamma))
    got = float(soft_dtw_from_dist_pallas(D, gamma, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(16, 16), (24, 40)])
def test_gradient_matches_autodiff(shape):
    g = np.random.default_rng(2)
    D = jnp.asarray(np.abs(g.standard_normal(shape)).astype(np.float32))
    want = jax.grad(lambda d: sdtw.soft_dtw_from_dist(d, 1.0))(D)
    got = jax.grad(lambda d: soft_dtw_from_dist_pallas(d, 1.0, True))(D)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_grad_through_sqdist_inputs():
    """End-to-end gradient wrt the sequences (the training-loss use)."""
    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((12, 4)).astype(np.float32))
    y = jnp.asarray(g.standard_normal((17, 4)).astype(np.float32))

    def loss_pallas(x):
        return soft_dtw_from_dist_pallas(sdtw.pairwise_sqdist(x, y), 1.0, True)

    def loss_scan(x):
        return sdtw.soft_dtw_from_dist(sdtw.pairwise_sqdist(x, y), 1.0)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(x)),
        np.asarray(jax.grad(loss_scan)(x)),
        rtol=1e-4, atol=1e-5,
    )


def test_batch_vmap():
    g = np.random.default_rng(4)
    D = jnp.asarray(np.abs(g.standard_normal((3, 32, 32))).astype(np.float32))
    want = jax.vmap(lambda d: sdtw.soft_dtw_from_dist(d, 1.0))(D)
    got = jax.vmap(lambda d: soft_dtw_from_dist_pallas(d, 1.0, True))(D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_dispatcher_forced_on_matches_scan(monkeypatch):
    """soft_dtw_from_dist with LFS2_USE_PALLAS=1 (interpret on CPU) routes
    through the kernel and matches the scan path."""
    from lightningfastspeech2_tpu.ops import kernel_gate

    monkeypatch.setenv("LFS2_USE_PALLAS", "1")
    kernel_gate.reset_cache()
    try:
        g = np.random.default_rng(5)
        x = jnp.asarray(g.standard_normal((20, 3)).astype(np.float32))
        y = jnp.asarray(g.standard_normal((25, 3)).astype(np.float32))
        got = float(sdtw.soft_dtw(x, y, gamma=0.5, normalize=True))
        want = float(
            sdtw._soft_dtw_from_dist_scan(sdtw.pairwise_sqdist(x, y), 0.5)
            - 0.5 * (
                sdtw._soft_dtw_from_dist_scan(sdtw.pairwise_sqdist(x, x), 0.5)
                + sdtw._soft_dtw_from_dist_scan(sdtw.pairwise_sqdist(y, y), 0.5)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        monkeypatch.delenv("LFS2_USE_PALLAS")
        kernel_gate.reset_cache()
