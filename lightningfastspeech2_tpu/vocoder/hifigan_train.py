"""HiFi-GAN adversarial training: discriminators, losses, train steps.

The reference ships only the generator (inference), delegating vocoder
fine-tuning to the FastDiff path; BASELINE.json config #5 asks for HiFi-GAN
fine-tuning to waveform, so the full published recipe (Kong et al. 2020) is
implemented here natively:

- MultiPeriodDiscriminator: period-p sub-discriminators (2,3,5,7,11) over
  (T/p, p)-folded waveforms with strided tall convolutions,
- MultiScaleDiscriminator: 3 scales (raw, /2, /4 average-pooled) of grouped
  1-D conv stacks,
- LSGAN adversarial losses, feature matching (x2), mel-spectrogram L1
  (x45) through the pure-JAX mel front-end (audio/mel.py),
- AdamW(0.8, 0.99) with exponential decay per the upstream config
  (reference ``third_party/hifigan/config.json:5-8``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from lightningfastspeech2_tpu.audio.mel import mel_spectrogram
from lightningfastspeech2_tpu.core.config import AudioConfig
from lightningfastspeech2_tpu.vocoder.hifigan import (
    Generator,
    HifiGanConfig,
    LRELU_SLOPE,
    TorchConv1d,
)


class PeriodDiscriminator(nn.Module):
    period: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        """wav (B, T) -> (logits, feature maps)."""
        B, T = wav.shape
        p = self.period
        pad = (p - T % p) % p
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if pad and T > 1 else "constant")
        x = x.reshape(B, -1, p, 1)  # (B, T/p, p, 1) NHWC
        feats = []
        channels = (32, 128, 512, 1024)
        for i, ch in enumerate(channels):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)), dtype=self.dtype,
                    name="conv4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                    name="conv_post")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class ScaleDiscriminator(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        x = wav[..., None]  # (B, T, 1)
        feats = []
        spec = [  # (channels, kernel, stride, groups)
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(spec):
            x = nn.Conv(ch, (k,), strides=(s,), padding=((k // 2, k // 2),),
                        feature_group_count=min(g, x.shape[-1]),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(1, (3,), padding=((1, 1),), dtype=self.dtype,
                    name="conv_post")(x)
        feats.append(x)
        return x[..., 0], feats


def _avg_pool(wav: jnp.ndarray, k: int = 4, s: int = 2) -> jnp.ndarray:
    x = wav[:, :, None]
    out = nn.avg_pool(x, (k,), strides=(s,), padding=((2, 2),))
    return out[:, :, 0]


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        outs, feats = [], []
        for p in self.periods:
            o, f = PeriodDiscriminator(p, self.dtype, name=f"period{p}")(wav)
            outs.append(o)
            feats.append(f)
        return outs, feats


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        outs, feats = [], []
        x = wav
        for i in range(self.n_scales):
            o, f = ScaleDiscriminator(self.dtype, name=f"scale{i}")(x)
            outs.append(o)
            feats.append(f)
            if i < self.n_scales - 1:
                x = _avg_pool(x)
        return outs, feats


class Discriminators(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        po, pf = MultiPeriodDiscriminator(dtype=self.dtype, name="mpd")(wav)
        so, sf = MultiScaleDiscriminator(dtype=self.dtype, name="msd")(wav)
        return po + so, pf + sf


# ---------------------------------------------------------------------------
# losses (Kong et al. 2020, eqs. 1-3)
# ---------------------------------------------------------------------------

def discriminator_loss(real_outs, fake_outs):
    loss = 0.0
    for r, f in zip(real_outs, fake_outs):
        loss = loss + jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
    return loss


def generator_adv_loss(fake_outs):
    loss = 0.0
    for f in fake_outs:
        loss = loss + jnp.mean((f - 1.0) ** 2)
    return loss


def feature_matching_loss(real_feats, fake_feats):
    loss = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss = loss + jnp.mean(jnp.abs(r - f))
    return loss


def mel_l1_loss(wav_pred, wav_true, audio_cfg: AudioConfig):
    mel_fn = jax.vmap(lambda w: mel_spectrogram(w, audio_cfg))
    return jnp.mean(jnp.abs(mel_fn(wav_pred) - mel_fn(wav_true)))


@dataclass(frozen=True)
class HifiGanTrainConfig:
    lr: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    mel_weight: float = 45.0
    fm_weight: float = 2.0
    segment_size: int = 8192


class HifiGanTrainer:
    """Generator/discriminator alternating updates, jitted."""

    def __init__(self, gen_cfg: HifiGanConfig = HifiGanConfig(),
                 train_cfg: HifiGanTrainConfig = HifiGanTrainConfig(),
                 audio_cfg: AudioConfig = AudioConfig(),
                 rng: jax.Array = None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.gen_cfg, self.train_cfg, self.audio_cfg = gen_cfg, train_cfg, audio_cfg
        self.generator = Generator(gen_cfg)
        self.discriminators = Discriminators()

        seg_mel = train_cfg.segment_size // gen_cfg.hop_length
        mel = jnp.zeros((1, seg_mel, gen_cfg.num_mels))
        wav = jnp.zeros((1, train_cfg.segment_size))
        self.gen_params = jax.jit(self.generator.init)(rng, mel)
        self.disc_params = jax.jit(self.discriminators.init)(
            jax.random.fold_in(rng, 1), wav
        )

        sched = optax.exponential_decay(train_cfg.lr, 1, train_cfg.lr_decay)
        self.gen_tx = optax.adamw(sched, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2)
        self.disc_tx = optax.adamw(sched, b1=train_cfg.adam_b1, b2=train_cfg.adam_b2)
        self.gen_opt = self.gen_tx.init(self.gen_params)
        self.disc_opt = self.disc_tx.init(self.disc_params)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        gen, disc = self.generator, self.discriminators
        tcfg, acfg = self.train_cfg, self.audio_cfg

        def step(gen_params, disc_params, gen_opt, disc_opt, mel, wav):
            # ---- discriminator update
            def d_loss_fn(dp):
                fake = gen.apply(gen_params, mel)
                fake = jax.lax.stop_gradient(fake)
                real_outs, _ = disc.apply(dp, wav)
                fake_outs, _ = disc.apply(dp, fake)
                return discriminator_loss(real_outs, fake_outs)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
            d_updates, disc_opt = self.disc_tx.update(d_grads, disc_opt,
                                                      disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)

            # ---- generator update
            def g_loss_fn(gp):
                fake = gen.apply(gp, mel)
                fake_outs, fake_feats = disc.apply(disc_params, fake)
                _, real_feats = disc.apply(disc_params, wav)
                adv = generator_adv_loss(fake_outs)
                fm = feature_matching_loss(real_feats, fake_feats)
                mel_l1 = mel_l1_loss(fake, wav, acfg)
                total = adv + tcfg.fm_weight * fm + tcfg.mel_weight * mel_l1
                return total, {"adv": adv, "fm": fm, "mel": mel_l1}

            (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn,
                                                        has_aux=True)(gen_params)
            g_updates, gen_opt = self.gen_tx.update(g_grads, gen_opt, gen_params)
            gen_params = optax.apply_updates(gen_params, g_updates)

            metrics = {"d_loss": d_loss, "g_loss": g_loss, **aux}
            return gen_params, disc_params, gen_opt, disc_opt, metrics

        return step

    def train_step(self, mel: jnp.ndarray, wav: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Returns metrics as DEVICE scalars: a float() here would force a
        host read every step — ~25-50 ms round trip through a remote-TPU
        tunnel, dwarfing the GAN step itself. Callers convert only when
        they actually log (cli/train_vocoder.py logs every log_every)."""
        (self.gen_params, self.disc_params, self.gen_opt, self.disc_opt,
         metrics) = self._step(
            self.gen_params, self.disc_params, self.gen_opt, self.disc_opt,
            mel, wav,
        )
        return metrics
