"""Joint acoustic-model + FastDiff-vocoder training wrapper.

Re-design of the reference's in-model FastDiff wiring
(reference ``fastspeech2.py:390-411,733-765``): the acoustic model emits
mel + a x0.1 residual correction head; the vocoder conditions on either the
predicted mel (+residual) or the ground-truth mel, mixed by an epoch-indexed
schedule probability; the waveform is truncated to (max_frames - 2) * hop
and masked by per-item mel lengths; the vocoder predicts epsilon for the
joint MSE loss (``loss.py:192-198``).

TPU notes: the schedule draw is a traced Bernoulli select (both mels are
already computed), so one compiled program serves the whole schedule; the
wav mask comes from the frame mask — static shapes throughout.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightningfastspeech2_tpu.core.config import ModelConfig
from lightningfastspeech2_tpu.models.fastspeech2 import FastSpeech2
from lightningfastspeech2_tpu.models.variance_adaptor import StatsTree
from lightningfastspeech2_tpu.vocoder import diffusion
from lightningfastspeech2_tpu.vocoder.fastdiff import FastDiff, FastDiffConfig


class JointFastSpeech2FastDiff(nn.Module):
    cfg: ModelConfig
    fastdiff_cfg: FastDiffConfig = FastDiffConfig()
    stats: StatsTree = ()
    prior_stats: StatsTree = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        inference: bool = False,
        tf: bool = True,
        schedule_p=1.0,  # P(condition on predicted mel); traced scalar ok
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        acoustic = FastSpeech2(
            cfg, self.stats, self.prior_stats, use_fastdiff_head=True,
            dtype=self.dtype, name="acoustic",
        )
        result = acoustic(batch, inference=inference, tf=tf,
                          deterministic=deterministic)

        if inference or "wav" not in batch:
            return result

        vocoder = FastDiff(self.fastdiff_cfg, self.dtype, name="fastdiff")
        hop = self.fastdiff_cfg.hop_length

        frame_mask = result["frame_mask"]
        mel_pred = result["mel"] + result["fastdiff_var"]
        mel_gt = batch["mel"][:, : mel_pred.shape[1]] + result["fastdiff_var"]
        use_pred = (
            jax.random.uniform(self.make_rng("sdp"), ()) < schedule_p
        )
        mel_cond = jnp.where(use_pred, mel_pred, mel_gt)

        # truncate by the batch's longest mel length - 2 (fastspeech2.py:748)
        T = mel_cond.shape[1] - 2
        mel_cond = mel_cond[:, :T]
        from lightningfastspeech2_tpu.data.wav import dequantize

        wav = dequantize(batch["wav"])[:, : T * hop]
        mel_lengths = jnp.sum(frame_mask, axis=1)
        wav_mask = (
            jnp.arange(T * hop)[None, :]
            < ((mel_lengths - 2) * hop)[:, None]
        )

        # epsilon-prediction training draw (FastDiff.py:104-143)
        hp = diffusion.compute_hyperparams(
            diffusion.linear_beta_schedule(
                self.fastdiff_cfg.beta_0, self.fastdiff_cfg.beta_T,
                self.fastdiff_cfg.T,
            )
        )
        B = wav.shape[0]
        ts = jax.random.randint(self.make_rng("sdp"), (B,), 0, hp.T)
        z = jax.random.normal(self.make_rng("sdp"), wav.shape)
        noisy = diffusion.diffuse(
            wav, ts, z, jnp.asarray(hp.alpha, jnp.float32)
        )
        eps = vocoder(noisy, mel_cond, ts.astype(jnp.float32), deterministic)
        eps = jnp.where(wav_mask, eps, 0.0)
        z = jnp.where(wav_mask, z, 0.0)

        result["fastdiff"] = (eps, z)
        result["wav_mask"] = wav_mask
        return result


def make_fastdiff_config(cfg: ModelConfig) -> FastDiffConfig:
    """FastDiffConfig from the model config's vocoder knobs (reference
    ``FastDiff.py:217-255`` argparse defaults). The upsample ratios must
    multiply to the audio hop length so one mel frame conditions exactly
    ``hop`` waveform samples."""
    fd = FastDiffConfig(
        inner_channels=cfg.fastdiff_inner_channels,
        cond_channels=cfg.audio.n_mels,
        upsample_ratios=cfg.fastdiff_upsample_ratios,
        lvc_layers_each_block=cfg.fastdiff_lvc_layers,
        kpnet_hidden_channels=cfg.fastdiff_kpnet_hidden,
        T=cfg.fastdiff_diffusion_T,
    )
    if fd.hop_length != cfg.audio.hop_length:
        raise ValueError(
            f"fastdiff_upsample_ratios {cfg.fastdiff_upsample_ratios} "
            f"multiply to {fd.hop_length}, need audio hop "
            f"{cfg.audio.hop_length}"
        )
    return fd


def schedule_probability(cfg: ModelConfig, epoch: int) -> float:
    """Epoch-indexed mix probability (fastspeech2.py:403-411,737-743)."""
    sched = cfg.fastdiff_schedule
    idx = epoch if epoch < cfg.fastdiff_schedule_end else -1
    idx = min(idx, len(sched) - 1) if idx >= 0 else -1
    return float(sched[idx])
