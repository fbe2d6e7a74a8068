"""Parity tests for the fused FastDiff LVC-stack kernel.

Reference: the XLA composition the kernel replaces — the inner loop of
TimeAwareLVCBlock (vocoder/fastdiff.py:232-243, mirroring reference
modules.py:197-218): per layer, residual audio add, leaky(0.2), dilated
conv (k=3, dilation 3^i, same pad), leaky(0.2), location-variable conv,
sigmoid*tanh gate, residual add.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.ops.pallas_fastdiff import fused_lvc_stack
from lightningfastspeech2_tpu.vocoder.fastdiff import (
    gated_activation,
    location_variable_convolution,
)


def _dilated_conv(y, w, b, d):
    # TorchConv1d semantics: cross-correlation, same padding = d*(k-1)//2
    return jax.lax.conv_general_dilated(
        y, w, window_strides=(1,), padding=[(d, d)], rhs_dilation=(d,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    ) + b


def _reference_stack(x, ad, kernels, biases, conv_w, conv_b, hop, fast):
    layers = kernels.shape[2]
    C = x.shape[-1]
    x = x.astype(jnp.float32)
    ad = ad.astype(jnp.float32)
    kernels = kernels.astype(jnp.float32)
    conv_w = conv_w.astype(jnp.float32)
    for i in range(layers):
        x = x + ad
        y = jax.nn.leaky_relu(x, 0.2)
        y = _dilated_conv(y, conv_w[i], conv_b[i], 3 ** i)
        y = jax.nn.leaky_relu(y, 0.2)
        y = location_variable_convolution(
            y, kernels[:, :, i], biases[:, :, i], hop)
        x = x + gated_activation(y, C, fast)
    return x


def _make_inputs(rng, B, nL, hop, layers=4, C=32, dtype=jnp.float32):
    L = nL * hop
    x = jnp.asarray(rng.normal(size=(B, L, C)), dtype)
    ad = jnp.asarray(rng.normal(size=(B, L, C)), dtype)
    kernels = jnp.asarray(
        rng.normal(size=(B, nL, layers, C, 2 * C, 3)) * 0.2, dtype)
    biases = jnp.asarray(rng.normal(size=(B, nL, layers, 2 * C)) * 0.1,
                         jnp.float32)
    conv_w = jnp.asarray(rng.normal(size=(layers, 3, C, C)) * 0.1, dtype)
    conv_b = jnp.asarray(rng.normal(size=(layers, C)) * 0.1, jnp.float32)
    return x, ad, kernels, biases, conv_w, conv_b


@pytest.mark.parametrize("hop,nL,tile_frames", [
    (64, 8, 4),     # stage-2 shape class, multi-tile
    (64, 6, 4),     # nL not a tile multiple (tail padding)
    (256, 4, 2),    # stage-3 shape class
    (64, 3, 8),     # single tile larger than the signal
    (8, 32, 16),    # stage-1 shape class: hop < reach -> hf=8 halo frames
    (8, 8, 16),     # stage 1, single tile (halo clamps to the tile itself)
    (8, 24, 12),    # stage 1, hf=6 (non-power-of-2 divisor), multi-tile
])
def test_fused_stack_matches_xla(rng, hop, nL, tile_frames):
    x, ad, kernels, biases, conv_w, conv_b = _make_inputs(
        np.random.default_rng(0), B=2, nL=nL, hop=hop)
    ref = _reference_stack(x, ad, kernels, biases, conv_w, conv_b, hop,
                           fast=False)
    got = fused_lvc_stack(x, ad, kernels, biases, conv_w, conv_b, hop,
                          fast_gating=False, tile_frames=tile_frames,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_stack_fast_gating(rng):
    x, ad, kernels, biases, conv_w, conv_b = _make_inputs(
        np.random.default_rng(1), B=1, nL=6, hop=64)
    ref = _reference_stack(x, ad, kernels, biases, conv_w, conv_b, 64,
                           fast=True)
    got = fused_lvc_stack(x, ad, kernels, biases, conv_w, conv_b, 64,
                          fast_gating=True, tile_frames=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_stack_bf16(rng):
    x, ad, kernels, biases, conv_w, conv_b = _make_inputs(
        np.random.default_rng(2), B=1, nL=4, hop=64, dtype=jnp.bfloat16)
    ref = _reference_stack(x, ad, kernels, biases, conv_w, conv_b, 64,
                           fast=False)
    got = fused_lvc_stack(x, ad, kernels, biases, conv_w, conv_b, 64,
                          fast_gating=False, tile_frames=4, interpret=True)
    # bf16 working dtype: residual carries round at ~1e-2 relative
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=0.1, atol=0.15)


@pytest.mark.parametrize("Tc", [
    3,    # stage 1 stays on XLA (serving default; also too short to halo)
    16,   # LFS2_FUSED_STAGE1 opt-in: all three stages on the fused kernel
])
def test_eps_apply_fused_matches_model(Tc, monkeypatch):
    """End-to-end eps parity: the fused serving path vs FastDiff.apply
    (same params) on a full 3-stage config (hop 8/64/256)."""
    if Tc >= 16:
        monkeypatch.setenv("LFS2_FUSED_STAGE1", "1")
    from lightningfastspeech2_tpu.vocoder.fastdiff import (
        FastDiff,
        FastDiffConfig,
        eps_apply_fused,
    )

    cfg = FastDiffConfig()
    model = FastDiff(cfg)
    B = 2
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, Tc * cfg.hop_length)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, Tc, cfg.cond_channels)), jnp.float32)
    ts = jnp.asarray([3.0, 77.0])
    params = model.init(jax.random.PRNGKey(0), x, c, ts)
    ref = model.apply(params, x, c, ts)
    got = eps_apply_fused(params, cfg, x, c, ts, dtype=jnp.float32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_layer_reach_guard():
    # nL=4 at hop 8: even a full-tile halo (4 frames x 8 rows = 32) can't
    # cover the 44-sample receptive reach -> the kernel must refuse
    x, ad, kernels, biases, conv_w, conv_b = _make_inputs(
        np.random.default_rng(3), B=1, nL=4, hop=8)
    with pytest.raises(AssertionError, match="reach"):
        fused_lvc_stack(x, ad, kernels, biases, conv_w, conv_b, 8,
                        interpret=True)
