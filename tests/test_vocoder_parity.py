"""Vocoder parity vs the ACTUAL reference modules: HiFi-GAN generator and
the FastDiff epsilon-network, with weight-norm folding through the real
converters."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference").exists(),
    reason="reference tree not mounted",
)



@pytest.fixture(scope="module")
def ref_pkg():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import litfass.third_party.hifigan.models as hifigan_models
    import litfass.third_party.fastdiff.FastDiff as fastdiff_mod

    return hifigan_models, fastdiff_mod


class _H(dict):
    """AttrDict for the reference hifigan config."""

    __getattr__ = dict.__getitem__


def test_hifigan_generator_parity_real_reference(ref_pkg):
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.vocoder import hifigan as hg

    hifigan_models, _ = ref_pkg
    torch.manual_seed(0)
    h = _H(
        resblock="1",
        upsample_rates=[8, 2],
        upsample_kernel_sizes=[16, 4],
        upsample_initial_channel=32,
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],  # reference ResBlock hardcodes 3 dilations
        num_mels=80,  # reference conv_pre hardcodes 80 input channels
    )
    ref_gen = hifigan_models.Generator(h).eval()
    # fold weight norm exactly as the reference does at inference
    ref_gen.remove_weight_norm()

    state = {n: p.detach().numpy() for n, p in ref_gen.state_dict().items()}
    cfg = hg.HifiGanConfig(
        resblock="1",
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        num_mels=80,
    )
    variables = jax.tree_util.tree_map(
        jnp.asarray, hg.convert_torch_state_dict(state, cfg)
    )

    g = np.random.default_rng(1)
    mel = g.standard_normal((2, 17, 80)).astype(np.float32)
    with torch.no_grad():
        want = ref_gen(torch.from_numpy(mel).transpose(1, 2)).numpy()[:, 0, :]
    got = hg.Generator(cfg).apply(variables, jnp.asarray(mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_fastdiff_eps_network_parity_real_reference(ref_pkg):
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.utils.torch_convert import (
        convert_fastdiff_state_dict,
    )
    from lightningfastspeech2_tpu.vocoder.fastdiff import (
        FastDiff, FastDiffConfig,
    )

    _, fastdiff_mod = ref_pkg
    torch.manual_seed(1)
    ref = fastdiff_mod.FastDiff(
        audio_channels=1, inner_channels=8, cond_channels=12,
        upsample_ratios=[4, 2, 2], lvc_layers_each_block=2,
        lvc_kernel_size=3, kpnet_hidden_channels=8, kpnet_conv_size=3,
        dropout=0.0, use_weight_norm=True, T=50,
    ).eval()
    state = {n: p.detach().numpy() for n, p in ref.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        convert_fastdiff_state_dict(state, n_blocks=3, lvc_layers=2),
    )

    cfg = FastDiffConfig(
        inner_channels=8, cond_channels=12, upsample_ratios=(4, 2, 2),
        lvc_layers_each_block=2, lvc_kernel_size=3, kpnet_hidden_channels=8,
        kpnet_conv_size=3, T=50,
    )
    g = np.random.default_rng(2)
    B, Tc = 2, 4
    hop = cfg.hop_length
    x = g.standard_normal((B, Tc * hop)).astype(np.float32)
    c = g.standard_normal((B, Tc, 12)).astype(np.float32)
    ts = np.array([3.0, 11.0], np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x), torch.from_numpy(c).transpose(1, 2),
            ts=torch.from_numpy(ts).reshape(B, 1),
        ).numpy()[:, 0, :]
    got = FastDiff(cfg).apply(variables, jnp.asarray(x), jnp.asarray(c),
                              jnp.asarray(ts))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)
