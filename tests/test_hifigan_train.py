"""HiFi-GAN adversarial training: discriminator shapes, loss structure,
and a few optimization steps that move both players."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.core.config import AudioConfig
from lightningfastspeech2_tpu.vocoder import hifigan as hg
from lightningfastspeech2_tpu.vocoder.hifigan_train import (
    Discriminators,
    HifiGanTrainConfig,
    HifiGanTrainer,
    MultiPeriodDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
    mel_l1_loss,
)


def test_mpd_shapes():
    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1024)),
                      jnp.float32)
    params = mpd.init(jax.random.PRNGKey(0), wav)
    outs, feats = mpd.apply(params, wav)
    assert len(outs) == 2 and len(feats) == 2
    for o in outs:
        assert o.shape[0] == 2 and o.ndim == 2
    assert all(len(f) == 6 for f in feats)


def test_loss_structure():
    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    assert float(discriminator_loss(real, fake)) == pytest.approx(0.0)
    assert float(generator_adv_loss(fake)) == pytest.approx(1.0)
    rf = [[jnp.ones((2, 4, 4))]]
    ff = [[jnp.zeros((2, 4, 4))]]
    assert float(feature_matching_loss(rf, ff)) == pytest.approx(1.0)


def test_mel_l1_zero_for_identical():
    acfg = AudioConfig()
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4096)),
                      jnp.float32)
    assert float(mel_l1_loss(wav, wav, acfg)) == 0.0


def test_trainer_steps_move_losses():
    gen_cfg = hg.HifiGanConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=80,
    )
    tcfg = HifiGanTrainConfig(segment_size=1024, lr=2e-4)
    trainer = HifiGanTrainer(gen_cfg, tcfg, AudioConfig(),
                             rng=jax.random.PRNGKey(0))
    g = np.random.default_rng(2)
    seg_mel = tcfg.segment_size // gen_cfg.hop_length
    mel = jnp.asarray(g.standard_normal((2, seg_mel, 80)), jnp.float32)
    wav = jnp.asarray(
        0.3 * np.sin(2 * np.pi * 220 * np.arange(tcfg.segment_size) / 22050)
        + 0.01 * g.standard_normal(tcfg.segment_size), jnp.float32,
    )[None].repeat(2, 0)

    m0 = trainer.train_step(mel, wav)
    for k, v in m0.items():
        assert np.isfinite(v), k
    m1 = trainer.train_step(mel, wav)
    # discriminator learns: its loss should drop over steps
    m = m1
    for _ in range(4):
        m = trainer.train_step(mel, wav)
    assert m["d_loss"] < m0["d_loss"]
