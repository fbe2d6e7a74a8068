"""FastDiff torch-checkpoint conversion: structural round-trip with a
synthetic weight-normed state dict in the reference layout."""

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.utils.torch_convert import (
    convert_fastdiff_state_dict,
)
from lightningfastspeech2_tpu.vocoder.fastdiff import FastDiff, FastDiffConfig


def synth_fastdiff_state(cfg: FastDiffConfig, rng):
    s = {}

    def wn_conv(prefix, cout, cin, k):
        v = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.05
        s[f"{prefix}.weight_g"] = np.ones((cout, 1, 1), np.float32)
        s[f"{prefix}.weight_v"] = v
        s[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def wn_convT(prefix, cin, cout, k):
        v = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.05
        s[f"{prefix}.weight_g"] = np.ones((cin, 1, 1), np.float32)
        s[f"{prefix}.weight_v"] = v
        s[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def lin(prefix, din, dout):
        s[f"{prefix}.weight"] = rng.standard_normal((dout, din)).astype(np.float32) * 0.05
        s[f"{prefix}.bias"] = np.zeros(dout, np.float32)

    ic = cfg.inner_channels
    wn_conv("first_audio_conv", ic, 1, 7)
    wn_conv("final_conv.0", cfg.audio_channels, ic, 7)
    lin("fc_t1", cfg.step_embed_dim_in, cfg.step_embed_dim_mid)
    lin("fc_t2", cfg.step_embed_dim_mid, cfg.step_embed_dim_out)

    n_blocks = len(cfg.upsample_ratios)
    for i in range(n_blocks):
        wn_conv(f"downsample.{i}.residual_dense", ic, ic, 1)
        for j in range(3):
            wn_conv(f"downsample.{i}.conv.{j}", ic, ic, 3)
    h = cfg.kpnet_hidden_channels
    lw = ic * 2 * ic * cfg.lvc_kernel_size * cfg.lvc_layers_each_block
    lb = 2 * ic * cfg.lvc_layers_each_block
    for n in range(n_blocks):
        p = f"lvc_blocks.{n}"
        wn_convT(f"{p}.upsample", ic, ic, cfg.upsample_ratios[n] * 2)
        lin(f"{p}.fc_t", cfg.step_embed_dim_out, cfg.cond_channels)
        wn_conv(f"{p}.kernel_predictor.input_conv.0", h, cfg.cond_channels, 5)
        for idx in (1, 3, 6, 8, 11, 13):
            wn_conv(f"{p}.kernel_predictor.residual_conv.{idx}", h, h,
                    cfg.kpnet_conv_size)
        wn_conv(f"{p}.kernel_predictor.kernel_conv", lw, h, cfg.kpnet_conv_size)
        wn_conv(f"{p}.kernel_predictor.bias_conv", lb, h, cfg.kpnet_conv_size)
        for j in range(cfg.lvc_layers_each_block):
            wn_conv(f"{p}.convs.{j}", ic, ic, cfg.lvc_kernel_size)
    return s


def test_fastdiff_conversion_structural():
    cfg = FastDiffConfig(
        inner_channels=8, cond_channels=12, upsample_ratios=(4, 2, 2),
        lvc_layers_each_block=2, kpnet_hidden_channels=8, T=50,
    )
    rng = np.random.default_rng(0)
    state = synth_fastdiff_state(cfg, rng)
    variables = convert_fastdiff_state_dict(
        state, n_blocks=3, lvc_layers=cfg.lvc_layers_each_block
    )

    model = FastDiff(cfg)
    B, Tc = 1, 4
    x = jnp.zeros((B, Tc * cfg.hop_length))
    c = jnp.zeros((B, Tc, cfg.cond_channels))
    ts = jnp.zeros((B,))
    init_vars = model.init(jax.random.PRNGKey(0), x, c, ts)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(np.shape, variables)
    assert ref_shapes == got_shapes

    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    eps = model.apply(variables, x, c, ts)
    assert np.isfinite(np.asarray(eps)).all()
