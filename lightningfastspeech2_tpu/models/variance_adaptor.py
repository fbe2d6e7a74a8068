"""Variance adaptor: duration/pitch/energy/SNR/SRMR prediction + injection.

TPU-native re-design of the reference adaptor
(reference ``litfass/fastspeech2/model.py:167-561``): phone-level variance
encoders add embeddings into the hidden states pre-length-regulation,
frame-level ones post-regulation; duration is predicted deterministically
(conv stack) or by a normalizing flow (models/sdp.py). All ragged ops are
static-shape (ops/length_regulator.py).

Bucketization follows torch.bucketize(right=False) semantics:
``searchsorted(boundaries, x, side='left')``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.audio import cwt as cwt_mod
from lightningfastspeech2_tpu.core.config import DurationConfig, VarianceConfig
from lightningfastspeech2_tpu.ops import length_regulator as lr


@dataclass(frozen=True)
class VarianceStats:
    """Corpus statistics for one variance (reference stats.json entries)."""

    min: float = 0.0
    max: float = 1.0
    mean: float = 0.0
    std: float = 1.0


# stats for all variances as a hashable module attribute
StatsTree = Tuple[Tuple[str, VarianceStats], ...]


def default_stats(variances: Tuple[str, ...]) -> StatsTree:
    return tuple((v, VarianceStats()) for v in variances)


def bucketize(x: jnp.ndarray, boundaries: jnp.ndarray) -> jnp.ndarray:
    """torch.bucketize(x, boundaries) with right=False."""
    return jnp.searchsorted(boundaries, x, side="left")


class VarianceConvLayer(nn.Module):
    """[Conv1d (opt. depthwise-separable) -> ReLU -> LayerNorm -> Dropout]
    (reference ``model.py:524-561``)."""

    hidden: int
    filter_size: int
    kernel_size: int
    dropout: float
    depthwise: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.depthwise:
            from lightningfastspeech2_tpu.ops.depthwise import DepthwiseConv1d

            h = DepthwiseConv1d(x.shape[-1], self.kernel_size, dtype=self.dtype,
                                name="depth")(x)
            h = nn.Conv(self.filter_size, (1,), dtype=self.dtype, name="point")(h)
        else:
            h = nn.Conv(
                self.filter_size,
                (self.kernel_size,),
                padding="SAME",
                dtype=self.dtype,
                name="conv",
            )(x)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)  # torch eps
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class VariancePredictor(nn.Module):
    """N conv layers + linear head to 1 (or n_scales for CWT), masked to 0
    (reference ``model.py:482-522``)."""

    nlayers: int
    hidden: int
    filter_size: int
    kernel_size: int
    dropout: float
    depthwise: bool
    cwt: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,  # True = valid
        deterministic: bool = True,
        return_conv: bool = False,
    ):
        # The reference's tensors END at the batch-max sequence length; our
        # static bucket extends further, and LayerNorm bias in those extra
        # rows would leak into the last frames through the convs. Zeroing
        # everything beyond the batch-wide extent (any() over the batch)
        # reproduces the reference exactly: rows the reference also has
        # (including shorter items' pad rows) stay computed, rows it never
        # materializes contribute nothing.
        extent = None
        if mask is not None:
            extent = jnp.any(mask, axis=0, keepdims=True)[..., None]
        h = x
        for i in range(self.nlayers):
            h = VarianceConvLayer(
                self.hidden,
                self.filter_size,
                self.kernel_size,
                self.dropout,
                self.depthwise,
                self.dtype,
                name=f"conv{i}",
            )(h, deterministic)
            if extent is not None:
                h = jnp.where(extent, h, 0.0)
        out = nn.Dense(10 if self.cwt else 1, dtype=self.dtype, name="linear")(h)
        if not self.cwt:
            out = out[..., 0]
        if mask is not None:
            m = mask if not self.cwt else mask[..., None]
            out = jnp.where(m, out, 0.0)
        if return_conv:
            return out, h
        return out


class VarianceEncoder(nn.Module):
    """Predict a variance, quantize the (target or predicted) value into
    ``nbins`` embeddings, and return (prediction, embedding)
    (reference ``model.py:373-461``).

    CWT mode predicts a 10-scale spectrogram plus utterance mean/std and
    recomposes the signal at inference; its embedding bins live in the log
    domain of the raw statistic.
    """

    nlayers: int
    hidden: int
    filter_size: int
    kernel_size: int
    dropout: float
    depthwise: bool
    stats: VarianceStats
    nbins: int
    cwt: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        tgt: Optional[jnp.ndarray],  # teacher signal; None at inference
        mask: Optional[jnp.ndarray] = None,  # True = valid
        control: float = 1.0,
        deterministic: bool = True,
    ):
        lo, hi = self.stats.min, self.stats.max
        if self.cwt:
            lo, hi = np.log(max(lo, 1e-10)), np.log(max(hi, 1e-10))
        bins = jnp.linspace(lo, hi, self.nbins - 1)
        embedding = nn.Embed(self.nbins, self.hidden, dtype=self.dtype, name="embedding")

        if not self.cwt:
            prediction = VariancePredictor(
                self.nlayers, self.hidden, self.filter_size, self.kernel_size,
                self.dropout, self.depthwise, False, self.dtype, name="predictor",
            )(x, mask, deterministic)
        else:
            prediction, out_conv = VariancePredictor(
                self.nlayers, self.hidden, self.filter_size, self.kernel_size,
                self.dropout, self.depthwise, True, self.dtype, name="predictor",
            )(x, mask, deterministic, return_conv=True)
            mean_std = nn.Dense(2, dtype=self.dtype, name="mean_std_linear")(
                jnp.mean(out_conv, axis=1)
            )
            mean, std = mean_std[:, 0], mean_std[:, 1]

        if tgt is not None:
            # teacher-forced embedding: denormalize (or log) the target and
            # bucketize (model.py:417-422)
            if self.cwt:
                tgt_vals = jnp.log(jnp.maximum(tgt, 1e-10))
            else:
                tgt_vals = tgt * self.stats.std + self.stats.mean
            emb = embedding(bucketize(tgt_vals, bins))
        else:
            if self.cwt:
                spectrogram = prediction
                recomposed = jax.vmap(cwt_mod.recompose)(prediction, mean, std)
                prediction = recomposed
                bucket_prediction = recomposed
            else:
                bucket_prediction = prediction * self.stats.std + self.stats.mean
            prediction = prediction * control
            emb = embedding(bucketize(bucket_prediction, bins))

        if not self.cwt:
            return prediction, emb
        if tgt is not None:
            return {"spectrogram": prediction, "mean": mean, "std": std}, emb
        return (
            {
                "reconstructed_signal": jnp.exp(prediction),
                "spectrogram": spectrogram,
                "mean": mean,
                "std": std,
            },
            emb,
        )


class SpeakerEmbedding(nn.Module):
    """Speaker conditioning broadcast over the sequence
    (reference ``model.py:125-143``; the id-path AttributeError there is
    fixed here — SURVEY.md 'defects to NOT replicate')."""

    hidden: int
    speaker_type: str  # "dvector" | "id" | "none"
    n_speakers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speakers: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        if self.speaker_type == "none":
            raise ValueError("SpeakerEmbedding called with speaker_type='none'")
        if "dvector" in self.speaker_type:
            out = nn.Dense(self.hidden, dtype=self.dtype, name="projection")(speakers)
        else:
            out = nn.Embed(self.n_speakers, self.hidden, dtype=self.dtype,
                           name="embedding")(speakers)
        out = nn.relu(out)
        return jnp.broadcast_to(
            out[:, None, :], (out.shape[0], seq_len, out.shape[-1])
        )


class PriorEmbedding(nn.Module):
    """Bucketize a scalar utterance-level prior into embeddings broadcast
    over the sequence (reference ``model.py:146-164``)."""

    hidden: int
    nbins: int
    stats: VarianceStats
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        bins = jnp.linspace(self.stats.min, self.stats.max, self.nbins - 1)
        emb = nn.Embed(self.nbins, self.hidden, dtype=self.dtype, name="embedding")(
            bucketize(x, bins)
        )
        emb = nn.relu(emb)
        return jnp.broadcast_to(
            emb[:, None, :], (x.shape[0], seq_len, emb.shape[-1])
        )


class VarianceAdaptor(nn.Module):
    """Full adaptor (reference ``model.py:167-341``).

    targets: dict with "duration" (B,P) plus per-variance teacher signals
    ("variances_pitch", "variances_pitch_signal" for CWT, ...); may be None
    at pure inference.
    """

    cfg: VarianceConfig
    duration_cfg: DurationConfig
    hidden: int
    max_frames: int
    stats: StatsTree
    nbins: int = 256
    dtype: jnp.dtype = jnp.float32

    def _stats_for(self, var: str) -> VarianceStats:
        for name, st in self.stats:
            if name == var:
                return st
        return VarianceStats()

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, P, H)
        phone_mask: jnp.ndarray,  # (B, P) True = valid
        targets: Optional[Dict[str, jnp.ndarray]] = None,
        inference: bool = False,
        tf: bool = True,  # teacher-force this step (sampled outside)
        oracles: Tuple[str, ...] = (),
        controls: Optional[Dict[str, float]] = None,
        deterministic: bool = True,
        duration_only: bool = False,
    ) -> Dict[str, Any]:
        c = self.cfg
        controls = controls or {}
        result: Dict[str, Any] = {}

        # ------------------------------------------------------- duration
        if self.duration_cfg.stochastic:
            from lightningfastspeech2_tpu.models.sdp import (
                StochasticDurationPredictor,
            )

            sdp = StochasticDurationPredictor(
                in_channels=self.hidden,
                filter_size=self.duration_cfg.filter_size,
                kernel_size=self.duration_cfg.kernel_size,
                dropout=self.duration_cfg.dropout,
                n_flows=self.duration_cfg.nlayers,
                dtype=self.dtype,
                name="duration_predictor",
            )
            x_det = jax.lax.stop_gradient(x)  # model.py:262-267
            if not inference:
                duration_pred = sdp(
                    x_det, phone_mask, targets["duration"].astype(self.dtype),
                    reverse=False, deterministic=deterministic,
                )
            else:
                duration_pred = sdp(
                    x_det, phone_mask, None, reverse=True,
                    deterministic=deterministic,
                )
                duration_pred = jnp.where(phone_mask, duration_pred, 0.0)
        else:
            duration_pred = VariancePredictor(
                self.duration_cfg.nlayers, self.hidden,
                self.duration_cfg.filter_size, self.duration_cfg.kernel_size,
                self.duration_cfg.dropout, self.duration_cfg.depthwise,
                False, self.dtype, name="duration_predictor",
            )(x, phone_mask, deterministic)

        if duration_only:
            # bucketed-serving duration pass (SpeechGenerator): only the
            # rounded durations are needed to pick the frame bucket, and
            # they depend on nothing past this point (the phone-level
            # variance encoders modify x AFTER duration prediction), so
            # skip the length regulator, the variance towers, and — in
            # the caller — the whole decoder. apply-time only (params
            # init always runs the full path).
            assert inference, "duration_only is an inference-serving path"
            if not self.duration_cfg.stochastic:
                duration_rounded = lr.round_durations_deterministic(duration_pred)
            else:
                duration_rounded = lr.round_durations_stochastic(duration_pred)
            duration_rounded = jnp.where(phone_mask, duration_rounded, 0)
            duration_rounded = lr.rescue_zero_durations(duration_rounded, phone_mask)
            return dict(
                duration_prediction=duration_pred,
                duration_rounded=duration_rounded,
            )

        # --------------------------------------- phone-level variances
        out_val = None
        for i, var in enumerate(c.variances):
            if c.levels[i] != "phone":
                continue
            pred, out = self._encode_variance(
                i, var, x, targets, phone_mask, inference, tf, oracles,
                controls.get(var, 1.0), deterministic,
            )
            result[f"variances_{var}"] = pred
            out_val = out if out_val is None else out_val + out
            x = x + out

        # ------------------------------------------------ length regulate
        if not inference:
            duration_rounded = targets["duration"].astype(jnp.int32)
        else:
            if not self.duration_cfg.stochastic:
                duration_rounded = lr.round_durations_deterministic(duration_pred)
            else:
                duration_rounded = lr.round_durations_stochastic(duration_pred)
            duration_rounded = jnp.where(phone_mask, duration_rounded, 0)
            duration_rounded = lr.rescue_zero_durations(duration_rounded, phone_mask)

        x, frame_mask = lr.regulate(x, duration_rounded, self.max_frames)
        if out_val is not None:
            out_val, _ = lr.regulate(out_val, duration_rounded, self.max_frames)

        # --------------------------------------- frame-level variances
        for i, var in enumerate(c.variances):
            if c.levels[i] != "frame":
                continue
            pred, out = self._encode_variance(
                i, var, x, targets, frame_mask, inference, tf, oracles,
                controls.get(var, 1.0), deterministic,
            )
            result[f"variances_{var}"] = pred
            out_val = out if out_val is None else out_val + out
            x = x + out

        result.update(
            x=x,
            duration_prediction=duration_pred,
            duration_rounded=duration_rounded,
            frame_mask=frame_mask,
            out=out_val,
        )
        return result

    def _encode_variance(
        self, i, var, x, targets, mask, inference, tf, oracles, control,
        deterministic,
    ):
        c = self.cfg
        is_cwt = c.transforms[i] == "cwt"
        enc = VarianceEncoder(
            c.nlayers[i], self.hidden, c.filter_size, c.kernel_sizes[i],
            c.dropouts[i], c.depthwise, self._stats_for(var), self.nbins,
            cwt=is_cwt, dtype=self.dtype, name=f"encoder_{var}",
        )
        use_target = ((not inference) and tf) or var in oracles
        tgt = None
        if use_target and targets is not None:
            key = f"variances_{var}_signal" if is_cwt else f"variances_{var}"
            tgt = targets.get(key)
        return enc(x, tgt, mask, control, deterministic)
