"""FastDiff vocoder: LVC op parity vs a direct torch transcription of the
reference op semantics, diffusion math invariants, and end-to-end
shapes/sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningfastspeech2_tpu.vocoder import diffusion
from lightningfastspeech2_tpu.vocoder.fastdiff import (
    FastDiff,
    FastDiffConfig,
    FastDiffVocoder,
    location_variable_convolution,
)


def torch_lvc(x, kernel, bias, hop_size, dilation=1):
    """Direct torch implementation of the unfold+einsum LVC op as specified
    in the FastDiff paper (modules.py:220-253 semantics), used as the
    parity oracle. x (B,C,L), kernel (B,Cin,Cout,ks,nL), bias (B,Cout,nL)."""
    batch, _, in_length = x.shape
    _, _, out_channels, kernel_size, kernel_length = kernel.shape
    padding = dilation * ((kernel_size - 1) // 2)
    x = torch.nn.functional.pad(x, (padding, padding))
    x = x.unfold(2, hop_size + 2 * padding, hop_size)
    if hop_size < dilation:
        x = torch.nn.functional.pad(x, (0, dilation))
    x = x.unfold(3, dilation, dilation)
    x = x[:, :, :, :, :hop_size]
    x = x.transpose(3, 4)
    x = x.unfold(4, kernel_size, 1)
    o = torch.einsum("bildsk,biokl->bolsd", x, kernel)
    o = o + bias.unsqueeze(-1).unsqueeze(-1)
    return o.contiguous().view(batch, out_channels, -1)


def test_lvc_matches_torch_unfold_einsum():
    g = np.random.default_rng(0)
    B, Cin, Cout, ks, nL, hop = 2, 4, 8, 3, 5, 16
    L = nL * hop
    x = g.standard_normal((B, L, Cin)).astype(np.float32)
    kernels = g.standard_normal((B, nL, Cin, Cout, ks)).astype(np.float32)
    bias = g.standard_normal((B, nL, Cout)).astype(np.float32)

    ours = location_variable_convolution(
        jnp.asarray(x), jnp.asarray(kernels), jnp.asarray(bias), hop
    )
    ref = torch_lvc(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(kernels.transpose(0, 2, 3, 4, 1)),
        torch.from_numpy(bias.transpose(0, 2, 1)),
        hop,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_hyperparams_match_reference_recursion():
    beta = diffusion.linear_beta_schedule(1e-6, 0.01, 50)
    hp = diffusion.compute_hyperparams(beta)
    # alpha_t = sqrt(prod (1-beta))
    np.testing.assert_allclose(hp.alpha, np.sqrt(np.cumprod(1 - beta)),
                               rtol=1e-12)
    assert (hp.sigma[1:] > 0).all()
    assert hp.sigma[0] == np.sqrt(beta[0])


def test_step_embedding_shape_and_values():
    emb = diffusion.step_embedding(jnp.asarray([0.0, 3.0]), 128)
    assert emb.shape == (2, 128)
    np.testing.assert_allclose(np.asarray(emb[0, :64]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(emb[0, 64:]), 1.0, atol=1e-7)


@pytest.mark.parametrize("N", [3, 4, 6, 8])
def test_inference_schedule_monotone_steps(N):
    hp = diffusion.compute_hyperparams(diffusion.linear_beta_schedule())
    sched = diffusion.make_inference_schedule(hp, N)
    assert len(sched.steps) <= N
    assert (np.diff(sched.steps) > 0).all()  # increasing noise with n
    assert (sched.alpha > 0).all() and (sched.alpha <= 1).all()


def small_cfg():
    return FastDiffConfig(
        inner_channels=8,
        cond_channels=12,
        upsample_ratios=(4, 2, 2),
        lvc_layers_each_block=2,
        kpnet_hidden_channels=8,
        T=50,
    )


def test_fastdiff_forward_shapes():
    cfg = small_cfg()
    model = FastDiff(cfg)
    B, Tc = 2, 6
    T = Tc * cfg.hop_length
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((B, T)), jnp.float32)
    c = jnp.asarray(g.standard_normal((B, Tc, cfg.cond_channels)), jnp.float32)
    ts = jnp.asarray([3.0, 10.0])
    params = model.init(jax.random.PRNGKey(0), x, c, ts)
    eps = model.apply(params, x, c, ts)
    assert eps.shape == (B, T)
    assert np.isfinite(np.asarray(eps)).all()


def test_fastdiff_train_and_inference():
    cfg = small_cfg()
    voc = FastDiffVocoder(cfg, rng=jax.random.PRNGKey(0))
    g = np.random.default_rng(2)
    B, Tc = 2, 4
    wav = jnp.asarray(g.standard_normal((B, Tc * cfg.hop_length)), jnp.float32)
    mel = jnp.asarray(g.standard_normal((B, Tc, cfg.cond_channels)), jnp.float32)
    eps, z = voc.train_eps(voc.params, wav, mel, jax.random.PRNGKey(1))
    assert eps.shape == wav.shape and z.shape == wav.shape
    loss = float(jnp.mean((eps - z) ** 2))
    assert np.isfinite(loss)

    out = voc.inference(mel, N=3, rng=jax.random.PRNGKey(2))
    assert out.shape == (B, Tc * cfg.hop_length)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5
