"""Flash-attention Pallas kernel vs the einsum reference (interpret mode
on CPU; compile-mode validation runs on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.ops.pallas_attention import flash_attention


def reference_attention(q, k, v, mask):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    s = jnp.where(mask[:, None, None, :], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _inputs(B=2, H=2, T=512, d=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, T, d)), dtype) for _ in range(3)
    )
    lengths = rng.integers(T // 2, T, size=B)
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    return q, k, v, mask


@pytest.mark.parametrize("T", [256, 512, 768])
def test_forward_matches_reference(T):
    q, k, v, mask = _inputs(T=T)
    out = flash_attention(q, k, v, mask, interpret=True)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    q, k, v, mask = _inputs(T=256)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, mask, interpret=True)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = reference_attention(q, k, v, mask)
        return jnp.sum(o * o)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_padded_queries_attend_valid_keys():
    """torch key_padding_mask semantics: only KEYS are masked."""
    q, k, v, _ = _inputs(T=256)
    mask = jnp.asarray(np.arange(256)[None, :] < 100).repeat(2, axis=0)
    out = flash_attention(q, k, v, mask, interpret=True)
    ref = reference_attention(q, k, v, mask)
    # rows past the key-valid region still produce the reference values
    np.testing.assert_allclose(np.asarray(out[:, :, 200:]),
                               np.asarray(ref[:, :, 200:]),
                               rtol=2e-5, atol=2e-5)


def test_self_attention_module_wiring(monkeypatch):
    """models.layers.SelfAttention routes through the kernel when the gate
    is forced on (interpret mode on CPU, training mode, T>=1024) and
    matches its einsum path."""
    from lightningfastspeech2_tpu.models.layers import SelfAttention, _flash_ok
    from lightningfastspeech2_tpu.ops import kernel_gate

    B, T, hidden, heads = 1, 1024, 256, 2
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, T, hidden)), jnp.float32
    )
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([900])[:, None])
    module = SelfAttention(hidden=hidden, heads=heads, dropout=0.0)
    params = module.init(jax.random.PRNGKey(0), x, mask)

    monkeypatch.setenv("LFS2_USE_PALLAS", "0")
    kernel_gate.reset_cache()
    ref = module.apply(params, x, mask, deterministic=False)

    monkeypatch.setenv("LFS2_USE_PALLAS", "1")
    kernel_gate.reset_cache()
    try:
        assert kernel_gate.pallas_interpret()  # CPU -> interpret mode
        assert _flash_ok(T, hidden // heads, deterministic=False)
        # gated OFF for inference and short sequences
        assert not _flash_ok(T, hidden // heads, deterministic=True)
        assert not _flash_ok(256, hidden // heads, deterministic=False)
        out = module.apply(params, x, mask, deterministic=False)
    finally:
        monkeypatch.setenv("LFS2_USE_PALLAS", "0")
        kernel_gate.reset_cache()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dropout_paths_run(monkeypatch):
    """Training-mode (dropout active) flash path executes and differs from
    the deterministic output, with grads finite."""
    from lightningfastspeech2_tpu.models.layers import SelfAttention
    from lightningfastspeech2_tpu.ops import kernel_gate

    B, T, hidden = 1, 1024, 256
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((B, T, hidden)), jnp.float32
    )
    module = SelfAttention(hidden=hidden, heads=2, dropout=0.5)
    params = module.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("LFS2_USE_PALLAS", "1")
    kernel_gate.reset_cache()
    try:
        det = module.apply(params, x, deterministic=True)

        def loss(p):
            out = module.apply(
                p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.mean(out ** 2), out

        (val, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
    finally:
        monkeypatch.setenv("LFS2_USE_PALLAS", "0")
        kernel_gate.reset_cache()
    assert not np.allclose(np.asarray(out), np.asarray(det))
    assert np.isfinite(float(val))
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()


def test_bf16_forward():
    q, k, v, mask = _inputs(T=256, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, mask, interpret=True)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
