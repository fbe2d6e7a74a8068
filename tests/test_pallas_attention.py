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


def test_dropout_mask_tiling_invariant_and_grads_match():
    """Round-4 regression: at T=1024 the forward picks Tq=1024 under
    dropout while the backward's VMEM budget forces Tq=512 — the old
    per-tile PRNG seeding produced DIFFERENT dropout masks in forward and
    backward (biased gradients at the decoder's training shapes). The
    position-hashed mask is tiling-invariant by construction; verify by
    replicating the hash externally, building a differentiable reference
    attention that uses the replicated mask, and checking BOTH the output
    and all three input grads against the kernel's custom VJP."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.ops.pallas_attention import (
        _pick_bwd_q_tile,
        _pick_q_tile,
        flash_attention,
    )

    B, H, T, d = 1, 1, 1024, 32
    rate, seed = 0.3, 17
    assert _pick_q_tile(T, rate) != _pick_bwd_q_tile(T), (
        "shape no longer exercises differing fwd/bwd tiles; pick another T"
    )

    # external replication of ops/pallas_attention._dropout_keep
    threshold = np.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
    r = np.arange(T, dtype=np.uint32)[:, None] * np.uint32(2654435761)
    c = np.arange(T, dtype=np.uint32)[None, :] * np.uint32(1013904223)
    x = (r ^ c) + np.uint32(seed)  # seed_bh = seed + b*H + h = seed
    x ^= x >> 16
    x = x * np.uint32(2246822519)
    x ^= x >> 13
    x = x * np.uint32(3266489917)
    x ^= x >> 16
    keep = jnp.asarray(x >= threshold)

    g = np.random.default_rng(3)
    q = jnp.asarray(g.standard_normal((B, H, T, d)), jnp.float32)
    k = jnp.asarray(g.standard_normal((B, H, T, d)), jnp.float32)
    v = jnp.asarray(g.standard_normal((B, H, T, d)), jnp.float32)
    mask = jnp.asarray(g.uniform(size=(B, T)) > 0.2)

    def ref(q, k, v):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k) / (d ** 0.5)
        s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(keep[None, None], p, 0.0) / (1.0 - rate)
        return jnp.einsum("bhts,bhsd->bhtd", p, v)

    def kern(q, k, v):
        return flash_attention(q, k, v, mask, dropout_rate=rate, seed=seed,
                               interpret=True)

    o_ref = ref(q, k, v)
    o_kern = kern(q, k, v)
    np.testing.assert_allclose(np.asarray(o_kern), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)

    do = jnp.asarray(g.standard_normal(o_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.vdot(ref(*a), do), argnums=(0, 1, 2))(
        q, k, v)
    g_kern = jax.grad(lambda *a: jnp.vdot(kern(*a), do), argnums=(0, 1, 2))(
        q, k, v)
    for name, a, b in zip("qkv", g_kern, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")
