"""HiFi-GAN parity tests: op-level equivalence against torch CPU, full
generator shape/upsampling contract, weight-norm folding, and torch
state-dict conversion through an independently-built torch generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningfastspeech2_tpu.vocoder import hifigan as hg


def test_conv1d_matches_torch():
    g = np.random.default_rng(0)
    B, T, Cin, Cout, k, d = 2, 33, 4, 6, 5, 3
    x = g.standard_normal((B, T, Cin)).astype(np.float32)
    tconv = torch.nn.Conv1d(Cin, Cout, k, dilation=d, padding=hg._get_padding(k, d))
    w = tconv.weight.detach().numpy()  # (out,in,k)
    b = tconv.bias.detach().numpy()
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).detach().numpy()
    ours = hg.conv1d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 1, 0))), jnp.asarray(b),
        dilation=d, padding=hg._get_padding(k, d),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("k,s", [(16, 8), (4, 2), (10, 5)])
def test_conv_transpose1d_matches_torch(k, s):
    g = np.random.default_rng(1)
    B, T, Cin, Cout = 2, 17, 4, 3
    pad = (k - s) // 2
    x = g.standard_normal((B, T, Cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=pad)
    w = tconv.weight.detach().numpy()  # (in,out,k)
    b = tconv.bias.detach().numpy()
    ref = tconv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).detach().numpy()
    ours = hg.conv_transpose1d(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 0, 1))), jnp.asarray(b),
        stride=s, padding=pad,
    )
    assert ours.shape == ref.shape  # == T*s only when k-s is even
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_weight_norm_fold_matches_torch():
    conv = torch.nn.Conv1d(4, 8, 3)
    wn = torch.nn.utils.weight_norm(conv)
    g = wn.weight_g.detach().numpy()
    v = wn.weight_v.detach().numpy()
    folded = hg.fold_weight_norm(g, v)
    np.testing.assert_allclose(folded, wn.weight.detach().numpy(), atol=1e-6)


def small_cfg():
    return hg.HifiGanConfig(
        upsample_rates=(8, 2),
        upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=20,
    )


def test_generator_shapes_and_range():
    cfg = small_cfg()
    gen = hg.Generator(cfg)
    mel = jnp.asarray(np.random.default_rng(2).standard_normal((2, 24, 20)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 24 * cfg.hop_length)
    assert float(jnp.abs(wav).max()) <= 1.0


class TorchRefGenerator(torch.nn.Module):
    """Independent torch build of the same architecture for conversion
    round-trip testing (written fresh against the published V1 recipe)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.upsample_initial_channel
        self.conv_pre = torch.nn.Conv1d(cfg.num_mels, ch0, 7, padding=3)
        self.ups = torch.nn.ModuleList()
        self.resblocks = torch.nn.ModuleList()
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin, cout = ch0 // (2**i), ch0 // (2 ** (i + 1))
            self.ups.append(
                torch.nn.ConvTranspose1d(cin, cout, k, stride=r, padding=(k - r) // 2)
            )
            for kr, ds in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                rb = torch.nn.Module()
                rb.convs1 = torch.nn.ModuleList(
                    [
                        torch.nn.Conv1d(cout, cout, kr, dilation=d,
                                        padding=hg._get_padding(kr, d))
                        for d in ds
                    ]
                )
                rb.convs2 = torch.nn.ModuleList(
                    [
                        torch.nn.Conv1d(cout, cout, kr,
                                        padding=hg._get_padding(kr, 1))
                        for _ in ds
                    ]
                )
                self.resblocks.append(rb)
        self.conv_post = torch.nn.Conv1d(
            ch0 // (2 ** len(cfg.upsample_rates)), 1, 7, padding=3
        )

    def forward(self, mel):
        lr = lambda t: torch.nn.functional.leaky_relu(t, hg.LRELU_SLOPE)
        x = self.conv_pre(mel)
        nk = len(self.cfg.resblock_kernel_sizes)
        for i, up in enumerate(self.ups):
            x = up(lr(x))
            acc = None
            for j in range(nk):
                rb = self.resblocks[i * nk + j]
                out = x
                for c1, c2 in zip(rb.convs1, rb.convs2):
                    out = out + c2(lr(c1(lr(out))))
                acc = out if acc is None else acc + out
            x = acc / nk
        # final activation uses torch's default slope 0.01 (models.py:161)
        x = torch.nn.functional.leaky_relu(x, 0.01)
        return torch.tanh(self.conv_post(x))


def test_torch_conversion_allclose():
    cfg = small_cfg()
    cfg = hg.HifiGanConfig(
        upsample_rates=cfg.upsample_rates,
        upsample_kernel_sizes=cfg.upsample_kernel_sizes,
        upsample_initial_channel=cfg.upsample_initial_channel,
        resblock_kernel_sizes=cfg.resblock_kernel_sizes,
        resblock_dilation_sizes=cfg.resblock_dilation_sizes,
        num_mels=cfg.num_mels,
    )
    torch.manual_seed(0)
    tgen = TorchRefGenerator(cfg).eval()
    mel = np.random.default_rng(3).standard_normal((1, 16, cfg.num_mels)).astype(
        np.float32
    )
    with torch.no_grad():
        ref = tgen(torch.from_numpy(mel).transpose(1, 2)).numpy()[:, 0, :]

    state = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    variables = hg.convert_torch_state_dict(state, cfg)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    ours = hg.Generator(cfg).apply(variables, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_resblock1_residual_structure():
    """ResBlock must be x + c2(lrelu(c1(lrelu(x)))) applied per dilation —
    the V1 recipe the reference uses (models.py:78-86)."""
    cfg = small_cfg()
    rb = hg.ResBlock1(8, 3, (1, 3))
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 12, 8)),
                    jnp.float32)
    params = rb.init(jax.random.PRNGKey(0), x)
    out = rb.apply(params, x)
    assert out.shape == x.shape
    # zero weights -> identity (residual path)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    np.testing.assert_allclose(np.asarray(rb.apply(zeros, x)), np.asarray(x))


def test_conv1d_folded_matches_dense():
    """conv1d_folded on the folded layout == conv1d on the dense layout."""
    g = np.random.default_rng(5)
    B, M, C, Cout, k, d, f = 2, 96, 8, 8, 7, 3, 4
    x = g.standard_normal((B, M, C)).astype(np.float32)
    w = g.standard_normal((k, C, Cout)).astype(np.float32) * 0.1
    b = g.standard_normal((Cout,)).astype(np.float32)
    pad = hg._get_padding(k, d)
    dense = hg.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), d, pad)
    xf = jnp.asarray(x).reshape(B, M // f, f * C)
    yf = hg.conv1d_folded(xf, jnp.asarray(w), jnp.asarray(b), d, f)
    np.testing.assert_allclose(
        np.asarray(yf.reshape(B, M, Cout)), np.asarray(dense), atol=1e-4
    )


@pytest.mark.parametrize("k,s", [(16, 8), (4, 2), (10, 5)])
def test_conv_transpose1d_matmul_matches_lax(k, s):
    """subpixel-conv formulation == lhs-dilation formulation == torch."""
    g = np.random.default_rng(6)
    B, T, Cin, Cout = 2, 19, 4, 3
    pad = (k - s) // 2
    x = jnp.asarray(g.standard_normal((B, T, Cin)).astype(np.float32))
    w = jnp.asarray(g.standard_normal((k, Cin, Cout)).astype(np.float32))
    b = jnp.asarray(g.standard_normal((Cout,)).astype(np.float32))
    ref = hg.conv_transpose1d(x, w, b, s, pad)
    ours = hg.conv_transpose1d_matmul(x, w, b, s, pad)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_generator_fold_invariance():
    """fold_resblocks=True/False produce identical waveforms for the
    same params (the folded layout is an internal re-tiling only)."""
    cfg = small_cfg()
    mel = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 24, 20)), jnp.float32
    )
    folded = hg.Generator(cfg, fold_resblocks=True)
    dense = hg.Generator(cfg, fold_resblocks=False)
    params = folded.init(jax.random.PRNGKey(1), mel)
    np.testing.assert_allclose(
        np.asarray(folded.apply(params, mel)),
        np.asarray(dense.apply(params, mel)),
        atol=1e-5,
    )
