"""Diffusion-based variance adaptor and speaker generator.

Re-design of the reference's FastDiff-variance components
(reference ``litfass/fastspeech2/fastdiff_variances.py``):

- ``FastDiffVariancePredictor``: conv stack conditioned on hidden states +
  noised target + step embedding; training predicts the noise z at a random
  t, inference runs the shared reverse sampler (frame-level 1-D signals).
- ``FastDiffVarianceAdaptor``: duration via the same diffusion predictor on
  the normalized log-duration target ``(log(d+1+U[0,0.49]) - 1.08)/0.96``
  (``fastdiff_variances.py:90-91``), then length regulation and per-variance
  diffusion encoders whose (predicted or teacher) values are bucketized into
  embeddings.
- ``FastDiffSpeakerGenerator``: an MLP diffusion model denoising utterance
  d-vectors conditioned on the speaker-mean d-vector
  (``fastdiff_variances.py:344-525``).

Losses pair each ``*_pred`` with its ``*_z`` noise target under MSE
(reference ``loss.py:105-115,173-180,200-201``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core.config import DurationConfig, VarianceConfig
from lightningfastspeech2_tpu.models.variance_adaptor import (
    StatsTree,
    VarianceConvLayer,
    VarianceStats,
    bucketize,
)
from lightningfastspeech2_tpu.ops import length_regulator as lr
from lightningfastspeech2_tpu.vocoder import diffusion
from lightningfastspeech2_tpu.vocoder.fastdiff import swish

DUR_LOG_MEAN = 1.08
DUR_LOG_STD = 0.96


class FastDiffVariancePredictor(nn.Module):
    """eps-predictor over a frame-level scalar signal
    (fastdiff_variances.py:147-235)."""

    nlayers: int
    hidden: int
    filter_size: int
    kernel_size: int
    dropout: float
    depthwise: bool
    T: int = 1000
    step_dim_in: int = 128
    step_dim_mid: int = 512
    step_dim_out: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        signal: jnp.ndarray,  # (B, T) noisy (or clean w/ ts=None) target
        cond: jnp.ndarray,    # (B, T, H) hidden states
        ts: jnp.ndarray,      # (B,) diffusion steps (fractional ok)
        mask: Optional[jnp.ndarray] = None,  # True = valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        emb = diffusion.step_embedding(ts, self.step_dim_in)
        emb = swish(nn.Dense(self.step_dim_mid, dtype=self.dtype,
                             name="fc_t1")(emb))
        emb = swish(nn.Dense(self.step_dim_out, dtype=self.dtype,
                             name="fc_t2")(emb))
        noise_embed = nn.Dense(self.hidden, dtype=self.dtype,
                               name="linear_noise")(emb)

        x = nn.Dense(self.hidden, dtype=self.dtype, name="linear_in")(
            signal[..., None]
        )
        h = x + cond + noise_embed[:, None, :]
        for i in range(self.nlayers):
            h = VarianceConvLayer(
                self.hidden, self.filter_size, self.kernel_size, self.dropout,
                self.depthwise, self.dtype, name=f"conv{i}",
            )(h, deterministic)
        out = nn.Dense(1, dtype=self.dtype, name="linear")(h)[..., 0]
        if mask is not None:
            out = jnp.where(mask, out, 0.0)
        return out


class _DiffusionSignal:
    """Host-side helpers shared by the scalar-signal diffusion paths."""

    def __init__(self, T: int = 1000, beta_0: float = 1e-6,
                 beta_T: float = 0.01):
        self.hp = diffusion.compute_hyperparams(
            diffusion.linear_beta_schedule(beta_0, beta_T, T)
        )

    def noise(self, signal, rng):
        B = signal.shape[0]
        ts_rng, z_rng = jax.random.split(rng)
        ts = jax.random.randint(ts_rng, (B,), 0, self.hp.T)
        z = jax.random.normal(z_rng, signal.shape)
        noisy = diffusion.diffuse(
            signal, ts, z, jnp.asarray(self.hp.alpha, jnp.float32)
        )
        return noisy, z, ts.astype(jnp.float32)


class FastDiffVarianceAdaptor(nn.Module):
    """Frame-level-only adaptor with diffusion predictors
    (fastdiff_variances.py:8-144). Returns per-variance (noise_pred, z)
    pairs at training and sampled signals at inference."""

    cfg: VarianceConfig
    duration_cfg: DurationConfig
    hidden: int
    max_frames: int
    stats: StatsTree
    nbins: int = 256
    inference_steps: int = 4
    T: int = 1000
    dtype: jnp.dtype = jnp.float32

    def _stats_for(self, var: str) -> VarianceStats:
        for name, st in self.stats:
            if name == var:
                return st
        return VarianceStats()

    def _predictor(self, name: str, nlayers: int, kernel: int, dropout: float):
        return FastDiffVariancePredictor(
            nlayers, self.hidden, self.cfg.filter_size, kernel, dropout,
            self.cfg.depthwise, self.T, dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        phone_mask: jnp.ndarray,
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        inference: bool = False,
        deterministic: bool = True,
        duration_only: bool = False,
    ) -> Dict[str, Any]:
        result: Dict[str, Any] = {}
        diff = _DiffusionSignal(self.T)

        dur_pred_mod = self._predictor(
            "duration_predictor", self.duration_cfg.nlayers,
            self.duration_cfg.kernel_size, self.duration_cfg.dropout,
        )
        if not inference:
            u = jax.random.uniform(self.make_rng("sdp"),
                                   targets["duration"].shape) * 0.49
            dur_target = (
                jnp.log(targets["duration"].astype(jnp.float32) + 1.0 + u)
                - DUR_LOG_MEAN
            ) / DUR_LOG_STD
            noisy, z, ts = diff.noise(dur_target, self.make_rng("sdp"))
            duration_pred = dur_pred_mod(noisy, x, ts, phone_mask,
                                         deterministic)
            result["duration_z"] = z
            duration_rounded = targets["duration"].astype(jnp.int32)
        else:
            raw = self._sample_duration(dur_pred_mod, x, phone_mask)
            duration_pred = raw
            denorm = raw * DUR_LOG_STD + DUR_LOG_MEAN
            duration_rounded = jnp.maximum(
                jnp.round(jnp.exp(denorm) - 1.0), 0.0
            ).astype(jnp.int32)
            duration_rounded = jnp.where(phone_mask, duration_rounded, 0)
            duration_rounded = lr.rescue_zero_durations(
                duration_rounded, phone_mask
            )
            result["duration_z"] = None

        if duration_only:
            # bucketed-serving duration pass (see VarianceAdaptor): the
            # sampled durations depend on nothing past this point
            assert inference, "duration_only is an inference-serving path"
            return dict(
                duration_prediction=duration_pred,
                duration_rounded=duration_rounded,
            )

        x, frame_mask = lr.regulate(x, duration_rounded, self.max_frames)

        out_val = None
        for i, var in enumerate(self.cfg.variances):
            st = self._stats_for(var)
            bins = jnp.linspace(st.min, st.max, self.nbins - 1)
            embedding = nn.Embed(self.nbins, self.hidden, dtype=self.dtype,
                                 name=f"embedding_{var}")
            predictor = self._predictor(
                f"predictor_{var}", self.cfg.nlayers[i],
                self.cfg.kernel_sizes[i], self.cfg.dropouts[i],
            )
            if not inference:
                tgt = targets[f"variances_{var}"][:, : x.shape[1]]
                noisy, z, ts = diff.noise(tgt, self.make_rng("sdp"))
                noise_pred = predictor(noisy, x, ts, frame_mask, deterministic)
                result[f"variances_{var}"] = noise_pred
                result[f"variances_{var}_z"] = z
                denorm = tgt * st.std + st.mean
                emb = embedding(bucketize(denorm, bins))
            else:
                pred = self._sample_signal(predictor, x, frame_mask)
                result[f"variances_{var}"] = pred
                result[f"variances_{var}_z"] = None
                denorm = pred * st.std + st.mean
                emb = embedding(bucketize(denorm, bins))
            out_val = emb if out_val is None else out_val + emb
            x = x + emb

        result.update(
            x=x,
            duration_prediction=duration_pred,
            duration_rounded=duration_rounded,
            frame_mask=frame_mask,
            out=out_val,
        )
        return result

    def _sample_duration(self, predictor, cond, mask):
        diff = _DiffusionSignal(self.T)
        schedule = diffusion.make_inference_schedule(diff.hp,
                                                     self.inference_steps)
        eps_fn = lambda sig, ts: predictor(sig, cond, ts, mask)
        return diffusion.reverse_sample(
            eps_fn, cond.shape[:2], schedule, self.make_rng("sdp")
        )

    def _sample_signal(self, predictor, cond, mask):
        diff = _DiffusionSignal(self.T)
        schedule = diffusion.make_inference_schedule(diff.hp,
                                                     self.inference_steps)
        eps_fn = lambda sig, ts: predictor(sig, cond, ts, mask)
        return diffusion.reverse_sample(
            eps_fn, cond.shape[:2], schedule, self.make_rng("sdp")
        )


class FastDiffSpeakerPredictor(nn.Module):
    """eps-predictor over d-vectors conditioned on the speaker mean
    (fastdiff_variances.py:390-480)."""

    hidden_dim: int
    c_dim: int
    speaker_dim: int
    step_dim_in: int = 128
    step_dim_mid: int = 512
    step_dim_out: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, ts):
        emb = diffusion.step_embedding(ts, self.step_dim_in)
        emb = swish(nn.Dense(self.step_dim_mid, dtype=self.dtype,
                             name="fc_t1")(emb))
        emb = swish(nn.Dense(self.step_dim_out, dtype=self.dtype,
                             name="fc_t2")(emb))
        noise_embed = nn.Dense(self.speaker_dim, dtype=self.dtype,
                               name="linear_noise")(emb)
        cond = nn.Dense(self.speaker_dim, dtype=self.dtype,
                        name="conditional_in")(c)
        h = x + cond + noise_embed
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp1")(h)
        h = nn.relu(h)
        return nn.Dense(self.speaker_dim, dtype=self.dtype,
                        name="linear_out")(h)


class FastDiffSpeakerGenerator(nn.Module):
    """Generate utterance d-vectors from a speaker-mean d-vector by
    denoising (fastdiff_variances.py:344-388)."""

    hidden_dim: int = 512
    c_dim: int = 256
    speaker_dim: int = 256
    inference_steps: int = 4
    T: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speaker_mean, utterance_dvec=None,
                 inference: bool = False):
        predictor = FastDiffSpeakerPredictor(
            self.hidden_dim, self.c_dim, self.speaker_dim,
            dtype=self.dtype, name="predictor",
        )
        diff = _DiffusionSignal(self.T)
        if inference:
            schedule = diffusion.make_inference_schedule(
                diff.hp, self.inference_steps
            )
            eps_fn = lambda x, ts: predictor(x, speaker_mean, ts)
            return diffusion.reverse_sample(
                eps_fn, speaker_mean.shape, schedule, self.make_rng("sdp")
            )
        noisy, z, ts = diff.noise(utterance_dvec, self.make_rng("sdp"))
        pred = predictor(noisy, speaker_mean, ts)
        return pred, z
