"""Parity tests for the fused HiFi-GAN resblock Pallas kernel
(ops/pallas_hifigan.py) in interpret mode, against the XLA vocoder path
(vocoder/hifigan.py). Compiled-mode validation happens on real TPU via
scripts/bench_vocoder_kernel.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.ops import pallas_hifigan as pk
from lightningfastspeech2_tpu.vocoder import hifigan as hg


@pytest.mark.parametrize("k,d,fold", [(3, 1, 1), (7, 3, 1), (3, 5, 2),
                                      (7, 1, 4), (11, 5, 4)])
def test_tap_blocks_match_folded_conv(k, d, fold):
    g = np.random.default_rng(0)
    C = 8
    M, B = 24, 2
    w = g.standard_normal((k, C, C)).astype(np.float32) * 0.3
    xf = g.standard_normal((B, M, fold * C)).astype(np.float32)
    ref = hg.conv1d_folded(jnp.asarray(xf), jnp.asarray(w), None, d, fold) \
        if fold > 1 else hg.conv1d(jnp.asarray(xf), jnp.asarray(w), None,
                                   d, d * (k - 1) // 2)
    W, shifts = pk.tap_blocks(jnp.asarray(w), d, fold)
    # y[m] = sum_t pad(xf)[m + shifts[t]] @ W[t] with zero out-of-range rows
    H = max(max(-min(shifts), max(shifts)), 0)
    xp = jnp.pad(jnp.asarray(xf), ((0, 0), (H, H), (0, 0)))
    y = sum(
        jax.lax.dynamic_slice_in_dim(xp, H + s, M, axis=1) @ W[t]
        for t, s in enumerate(shifts)
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fold,tile_m", [(1, 32), (4, 32), (2, 16)])
def test_fused_resblock_interpret_matches_xla(fold, tile_m):
    g = np.random.default_rng(1)
    C, k, ds = 8, 3, (1, 3, 5)
    B, M = 2, 72  # M not a multiple of tile_m exercises tail padding
    rb = hg.ResBlock1(C, k, ds, jnp.float32, fold)
    xf = jnp.asarray(g.standard_normal((B, M, fold * C)), jnp.float32)
    params = rb.init(jax.random.PRNGKey(0), xf)
    ref = rb.apply(params, xf)
    weights, shifts, biases = pk.resblock_taps(
        params["params"], k, ds, fold, jnp.float32)
    out = pk.fused_resblock(xf, weights, shifts, biases,
                            tile_m=tile_m, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generator_apply_fused_matches_generator():
    cfg = hg.HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=20,
    )
    gen = hg.Generator(cfg, dtype=jnp.bfloat16)
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 24, 20)), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    ref = gen.apply(params, mel)
    out = hg.generator_apply_fused(params, mel, cfg, dtype=jnp.bfloat16,
                                   tile_m=64, interpret=True)
    assert out.shape == ref.shape
    # both paths run convs with f32 accumulation over bf16 values; the
    # fused kernel reorders the tap sums, so allow bf16-scale tolerance
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.02)


@pytest.mark.parametrize("fold,tile_m", [(1, 32), (4, 32), (2, 16)])
def test_fused_resblock_trio_interpret_matches_xla(fold, tile_m):
    """Whole-stage trio kernel == mean of the three XLA resblocks."""
    g = np.random.default_rng(3)
    C = 8
    B, M = 2, 72  # M not a multiple of tile_m exercises tail padding
    specs = [(3, (1, 3, 5)), (7, (1, 3, 5)), (11, (1, 3, 5))]
    xf = jnp.asarray(g.standard_normal((B, M, fold * C)), jnp.float32)
    weights, shifts, biases, ref = [], [], [], None
    for i, (k, ds) in enumerate(specs):
        rb = hg.ResBlock1(C, k, ds, jnp.float32, fold)
        params = rb.init(jax.random.PRNGKey(i), xf)
        y = rb.apply(params, xf)
        ref = y if ref is None else ref + y
        w_i, s_i, b_i = pk.resblock_taps(
            params["params"], k, ds, fold, jnp.float32)
        weights += w_i
        shifts += s_i
        biases.append(b_i)
    ref = ref / len(specs)
    out = pk.fused_resblock_trio(
        xf, weights, shifts, jnp.concatenate(biases, axis=0),
        n_res=len(specs), tile_m=tile_m, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
