"""Length-regulator parity vs the reference's repeat_interleave semantics
(reference ``litfass/fastspeech2/model.py:344-370``)."""

import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.ops import length_regulator as lr


def reference_expand(x, durations, max_length):
    """Direct numpy transcription of repeat_interleave + pad + truncate."""
    B = x.shape[0]
    reps = [np.repeat(x[i], durations[i], axis=0) for i in range(B)]
    lengths = np.array([r.shape[0] for r in reps])
    T = min(lengths.max(), max_length)
    out = np.zeros((B, T) + x.shape[2:], dtype=x.dtype)
    for i, r in enumerate(reps):
        out[i, : min(len(r), T)] = r[:T]
    pad_mask = ~(np.arange(T)[None, :] < lengths[:, None])  # True = padding
    return out, pad_mask


def test_regulate_matches_repeat_interleave():
    g = np.random.default_rng(0)
    B, P, H = 3, 10, 4
    x = g.standard_normal((B, P, H)).astype(np.float32)
    durations = g.integers(0, 6, (B, P)).astype(np.int32)
    max_frames = 64

    ref, ref_pad_mask = reference_expand(x, durations, max_frames)
    ours, mask = lr.regulate(jnp.asarray(x), jnp.asarray(durations), max_frames)
    ours = np.asarray(ours)
    mask = np.asarray(mask)

    T = ref.shape[1]
    np.testing.assert_allclose(ours[:, :T], ref, atol=1e-6)
    # everything past each item's total duration is masked off and zero
    np.testing.assert_array_equal(mask[:, :T], ~ref_pad_mask)
    assert not mask[:, T:].any()
    assert (ours[:, T:] == 0).all()


def test_regulate_truncates_at_max_frames():
    x = jnp.ones((1, 4, 2))
    durations = jnp.array([[10, 10, 10, 10]], dtype=jnp.int32)
    out, mask = lr.regulate(x, durations, 16)
    assert out.shape == (1, 16, 2)
    assert mask.all()


def test_regulate_scalar_sequences():
    x = jnp.array([[1.0, 2.0, 3.0]])
    durations = jnp.array([[2, 0, 3]], dtype=jnp.int32)
    out, mask = lr.regulate(x, durations, 8)
    np.testing.assert_allclose(
        np.asarray(out[0]), [1, 1, 3, 3, 3, 0, 0, 0], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(mask[0]), [1, 1, 1, 1, 1, 0, 0, 0]
    )


def test_rounding_rules():
    # deterministic: round(exp(p) - 1) clamped >= 0 (model.py:300,305)
    pred = jnp.array([[-1.0, 0.0, 1.0, 2.0]])
    d = np.asarray(lr.round_durations_deterministic(pred))
    np.testing.assert_array_equal(d, [[0, 0, 2, 6]])
    # stochastic: ceil(exp(p)), zeros stay zero (model.py:302-305)
    d = np.asarray(lr.round_durations_stochastic(pred))
    np.testing.assert_array_equal(d, [[1, 0, 3, 8]])


def test_zero_duration_rescue():
    durations = jnp.array([[0, 0, 1, 0], [2, 2, 2, 2]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 1], [1, 1, 1, 1]], dtype=bool)
    out = np.asarray(lr.rescue_zero_durations(durations, mask))
    np.testing.assert_array_equal(out[0], [1, 1, 1, 1])  # rescued
    np.testing.assert_array_equal(out[1], [2, 2, 2, 2])  # untouched


def test_gradients_flow_like_segment_sum():
    import jax

    x = jnp.arange(6.0).reshape(1, 3, 2)
    durations = jnp.array([[2, 1, 3]], dtype=jnp.int32)

    def f(x):
        out, _ = lr.regulate(x, durations, 8)
        return jnp.sum(out * jnp.arange(8)[None, :, None])

    grad = jax.grad(f)(x)
    # phone 0 covers frames 0,1 -> weight 0+1; phone 1 frame 2; phone 2
    # frames 3,4,5
    np.testing.assert_allclose(np.asarray(grad[0, :, 0]), [1.0, 2.0, 12.0])
