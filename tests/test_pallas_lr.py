"""Pallas length-regulator kernel vs the XLA reference implementation
(interpret mode on CPU; compiled parity runs on real TPU via bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.ops import length_regulator as lr
from lightningfastspeech2_tpu.ops.pallas_length_regulator import regulate_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_forward(seed):
    g = np.random.default_rng(seed)
    B, P, H, T = 2, 16, 8, 64
    x = jnp.asarray(g.standard_normal((B, P, H)), jnp.float32)
    durations = jnp.asarray(g.integers(0, 8, (B, P)), jnp.int32)

    ref, ref_mask = lr.regulate(x, durations, T)
    out, mask = regulate_pallas(x, durations, T, t_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))


def test_pallas_gradient_matches_xla():
    g = np.random.default_rng(2)
    B, P, H, T = 2, 8, 4, 32
    x = jnp.asarray(g.standard_normal((B, P, H)), jnp.float32)
    durations = jnp.asarray(g.integers(0, 6, (B, P)), jnp.int32)
    w = jnp.asarray(g.standard_normal((B, T, H)), jnp.float32)

    def loss_ref(x):
        out, _ = lr.regulate(x, durations, T)
        return jnp.sum(out * w)

    def loss_pallas(x):
        out, _ = regulate_pallas(x, durations, T, t_tile=16, interpret=True)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref)(x)
    g_pal = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)


def test_pallas_truncation_and_overflow():
    # total durations exceed max_frames -> truncate, mask all True
    x = jnp.ones((1, 4, 4))
    durations = jnp.asarray([[20, 20, 20, 20]], jnp.int32)
    out, mask = regulate_pallas(x, durations, 32, t_tile=16, interpret=True)
    assert mask.all()
    np.testing.assert_allclose(np.asarray(out), 1.0)
