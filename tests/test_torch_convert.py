"""torch -> JAX conversion: MHA numerical parity and full-model structural
round-trip with a synthetic reference-format state dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2, make_dummy_batch,
)
from lightningfastspeech2_tpu.models.layers import SelfAttention
from lightningfastspeech2_tpu.utils import torch_convert as tc
from tests.test_model import tiny_config


def test_self_attention_matches_torch_mha():
    torch.manual_seed(0)
    H, heads, B, T = 32, 2, 2, 11
    mha = torch.nn.MultiheadAttention(H, heads, batch_first=True)
    state = {f"self_attn.{k}": v.detach().numpy()
             for k, v in mha.state_dict().items()}
    params = tc._attention(state, "self_attn")

    g = np.random.default_rng(0)
    x = g.standard_normal((B, T, H)).astype(np.float32)
    pad = np.zeros((B, T), bool)
    pad[1, 7:] = True  # padding on item 1

    with torch.no_grad():
        ref, _ = mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            key_padding_mask=torch.from_numpy(pad),
        )
    ours = SelfAttention(H, heads, dropout=0.0).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x), jnp.asarray(~pad), deterministic=True,
    )
    # compare only non-pad positions (torch zeroes nothing, but pad queries
    # attend over valid keys identically)
    np.testing.assert_allclose(
        np.asarray(ours)[~pad], ref.numpy()[~pad], atol=2e-5
    )


def synth_state_dict(cfg: C.ModelConfig, vocab: int, rng):
    """Build a reference-format state dict with random values and the exact
    shapes the reference modules would produce."""
    s = {}
    H = cfg.hidden

    def lin(prefix, din, dout):
        s[f"{prefix}.weight"] = rng.standard_normal((dout, din)).astype(np.float32) * 0.05
        s[f"{prefix}.bias"] = np.zeros(dout, np.float32)

    def conv(prefix, cin, cout, k, groups=1):
        s[f"{prefix}.weight"] = rng.standard_normal(
            (cout, cin // groups, k)
        ).astype(np.float32) * 0.05
        s[f"{prefix}.bias"] = np.zeros(cout, np.float32)

    def norm(prefix, dim):
        s[f"{prefix}.weight"] = np.ones(dim, np.float32)
        s[f"{prefix}.bias"] = np.zeros(dim, np.float32)

    s["phone_embedding.weight"] = rng.standard_normal(
        (vocab, H)
    ).astype(np.float32) * 0.05

    for side, scfg in (("encoder", cfg.encoder), ("decoder", cfg.decoder)):
        F = scfg.conv_filter_size
        for i in range(scfg.layers):
            p = f"{side}.layers.{i}"
            s[f"{p}.self_attn.in_proj_weight"] = rng.standard_normal(
                (3 * H, H)
            ).astype(np.float32) * 0.05
            s[f"{p}.self_attn.in_proj_bias"] = np.zeros(3 * H, np.float32)
            lin(f"{p}.self_attn.out_proj", H, H)
            norm(f"{p}.norm1", H)
            norm(f"{p}.norm2", H)
            k = scfg.kernel_sizes[i]
            if scfg.depthwise:
                conv(f"{p}.conv1.0", H, H, k, groups=H)
                conv(f"{p}.conv1.1", H, F, 1)
                conv(f"{p}.conv2.0", F, F, 1, groups=H)
                conv(f"{p}.conv2.1", F, H, 1)
            else:
                conv(f"{p}.conv1", H, F, k)
                conv(f"{p}.conv2", F, H, 1)

    lin("linear", H, cfg.audio.n_mels)
    if cfg.speaker_type == "dvector":
        # the reference hardcodes Linear(256, H); use cfg.dvector_dim so the
        # tiny test config round-trips too
        lin("speaker_embedding.projection", cfg.dvector_dim, H)

    def vpred(prefix, nlayers, k, fs, depthwise):
        for i in range(nlayers):
            p = f"{prefix}.layers.{i}"
            cin = H if i == 0 else fs
            if depthwise:
                conv(f"{p}.layers.0.module.0", cin, cin, k, groups=cin)
                conv(f"{p}.layers.0.module.1", cin, fs, 1)
            else:
                conv(f"{p}.layers.0.module", cin, fs, k)
            norm(f"{p}.layers.2", fs)
        lin(f"{prefix}.linear", fs, 1)

    vpred("variance_adaptor.duration_predictor", cfg.duration.nlayers,
          cfg.duration.kernel_size, cfg.duration.filter_size,
          cfg.duration.depthwise)
    for i, var in enumerate(cfg.variance.variances):
        p = f"variance_adaptor.encoders.{var}"
        vpred(f"{p}.predictor", cfg.variance.nlayers[i],
              cfg.variance.kernel_sizes[i], cfg.variance.filter_size,
              cfg.variance.depthwise)
        s[f"{p}.embedding.weight"] = rng.standard_normal(
            (cfg.variance.nbins, H)
        ).astype(np.float32) * 0.05
    return s


@pytest.mark.parametrize("depthwise", [True, False])
def test_full_conversion_structural(depthwise):
    cfg = tiny_config()
    if not depthwise:
        cfg = C.replace(cfg, **{
            "model.encoder": C.replace(cfg.model.encoder, depthwise=False),
            "model.decoder": C.replace(cfg.model.decoder, depthwise=False),
            "model.variance": C.replace(cfg.model.variance, depthwise=False),
            "model.duration": C.replace(cfg.model.duration, depthwise=False),
        })
    mcfg = cfg.model
    rng = np.random.default_rng(1)
    state = synth_state_dict(mcfg, mcfg.vocab_size, rng)
    variables = tc.convert_fastspeech2_state_dict(state, mcfg)

    # the converted tree must match the model's own init exactly
    model = FastSpeech2(mcfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(mcfg, 2, 8).items()}
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sdp": jax.random.PRNGKey(2)},
        batch, deterministic=True,
    )
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, init_vars)
    got_shapes = jax.tree_util.tree_map(np.shape, variables)
    assert ref_shapes == got_shapes, (
        f"param tree mismatch:\nmissing={set(map(str, jax.tree_util.tree_leaves_with_path(ref_shapes))) - set(map(str, jax.tree_util.tree_leaves_with_path(got_shapes)))}"
    )

    # forward runs with converted params
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    out = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(np.asarray(out["mel"])).all()
