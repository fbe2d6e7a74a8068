"""FastSpeech2 training losses (reference ``litfass/fastspeech2/loss.py``).

Masked formulation: the reference's ``masked_select(...).mean()`` equals a
sum over valid elements divided by their count — reproduced here without
ragged shapes so everything jits. Loss weights follow
``fastspeech2.py:461-473`` (mel 1.0, per-variance weights, duration
weight).

Supported elementwise losses: "mse", "l1"; "soft_dtw" uses the on-device
soft-DTW (ops/soft_dtw.py) chunked at ``soft_dtw_chunk_size`` frames like
the reference (loss.py:69-78).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from lightningfastspeech2_tpu.core.config import Config


def masked_mean_loss(
    pred: jnp.ndarray,
    truth: jnp.ndarray,
    mask: jnp.ndarray,
    kind: str,
) -> jnp.ndarray:
    """Mean elementwise loss over valid positions. ``mask`` broadcasts
    against the loss (trailing feature dims averaged in)."""
    if kind == "mse":
        elt = jnp.square(pred - truth)
    elif kind == "l1":
        elt = jnp.abs(pred - truth)
    else:
        raise ValueError(f"unknown loss kind {kind}")
    while mask.ndim < elt.ndim:
        mask = mask[..., None]
    mask = jnp.broadcast_to(mask, elt.shape)
    total = jnp.sum(jnp.where(mask, elt, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def soft_dtw_loss(pred, truth, mask, gamma: float, chunk: int) -> jnp.ndarray:
    from lightningfastspeech2_tpu.ops.soft_dtw import soft_dtw_batch

    while mask.ndim < pred.ndim:
        mask = mask[..., None]
    pred = jnp.where(mask, pred, 0.0)
    truth = jnp.where(mask, truth, 0.0)
    T = pred.shape[1]
    total = 0.0
    for s in range(0, T, chunk):
        e = min(s + chunk, T)
        total = total + jnp.sum(
            soft_dtw_batch(pred[:, s:e], truth[:, s:e], gamma=gamma)
        )
    return total


def compute_losses(
    result: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    cfg: Config,
    frozen_components: Tuple[str, ...] = (),
) -> Dict[str, jnp.ndarray]:
    """Returns per-component losses + weighted "total"."""
    mcfg = cfg.model
    vcfg = mcfg.variance
    tcfg = cfg.train
    losses: Dict[str, jnp.ndarray] = {}

    phone_mask = result["phone_mask"]
    frame_mask = result["frame_mask"]

    # ---------------------------------- diffusion (FastDiff) components
    if mcfg.fastdiff_variances:
        # each variance/duration loss is MSE(noise_pred, z)
        # (reference loss.py:105-115,173-180)
        for var in vcfg.variances:
            losses[var] = masked_mean_loss(
                result[f"variances_{var}"], result[f"variances_{var}_z"],
                frame_mask, "mse",
            )
        losses["duration"] = masked_mean_loss(
            result["duration_prediction"], result["duration_z"],
            phone_mask, "mse",
        )
        losses["mel"] = masked_mean_loss(
            result["mel"], batch["mel"][:, : result["mel"].shape[1]],
            frame_mask, tcfg.mel_loss,
        )
        if "fastdiff" in result:
            eps, z = result["fastdiff"]
            losses["fastdiff"] = masked_mean_loss(
                eps, z, result["wav_mask"], "mse"
            )
        if result.get("speaker_z") is not None:
            losses["speakers"] = jnp.mean(
                jnp.square(result["speaker_pred"] - result["speaker_z"])
            )
        weights = {"mel": tcfg.mel_loss_weight,
                   "duration": mcfg.duration.loss_weight,
                   "fastdiff": 1e-1, "speakers": 1.0}
        for i, var in enumerate(vcfg.variances):
            weights[var] = vcfg.loss_weights[i]
        total = 0.0
        for key, value in losses.items():
            if any(f in key for f in frozen_components):
                continue
            total = total + weights.get(key, 1.0) * value
        losses["total"] = total
        return losses

    # ------------------------------------------------------- variances
    for i, var in enumerate(vcfg.variances):
        level = vcfg.levels[i]
        transform = vcfg.transforms[i]
        kind = vcfg.losses[i]
        mask = phone_mask if level == "phone" else frame_mask
        if transform == "cwt":
            pred = result[f"variances_{var}"]["spectrogram"]
            truth = batch[f"variances_{var}_spectrogram"]
            if kind == "soft_dtw":
                losses[f"{var}_cwt"] = soft_dtw_loss(
                    pred, truth, mask, tcfg.soft_dtw_gamma, tcfg.soft_dtw_chunk_size
                )
            else:
                losses[f"{var}_cwt"] = masked_mean_loss(pred, truth, mask, kind)
            losses[f"{var}_mean"] = jnp.mean(
                jnp.square(
                    result[f"variances_{var}"]["mean"] - batch[f"variances_{var}_mean"]
                )
            )
            losses[f"{var}_std"] = jnp.mean(
                jnp.square(
                    result[f"variances_{var}"]["std"] - batch[f"variances_{var}_std"]
                )
            )
        else:
            pred = result[f"variances_{var}"]
            truth = batch[f"variances_{var}"]
            if level == "frame":
                truth = truth[:, : pred.shape[1]]
            if kind == "soft_dtw":
                losses[var] = soft_dtw_loss(
                    pred[..., None], truth[..., None], mask[..., None],
                    tcfg.soft_dtw_gamma, tcfg.soft_dtw_chunk_size,
                )
            else:
                losses[var] = masked_mean_loss(pred, truth, mask, kind)

    # ------------------------------------------------------------- mel
    if tcfg.mel_loss == "soft_dtw":
        losses["mel"] = soft_dtw_loss(
            result["mel"], batch["mel"][:, : result["mel"].shape[1]], frame_mask,
            tcfg.soft_dtw_gamma, tcfg.soft_dtw_chunk_size,
        )
    else:
        losses["mel"] = masked_mean_loss(
            result["mel"],
            batch["mel"][:, : result["mel"].shape[1]],
            frame_mask,
            tcfg.mel_loss,
        )

    # -------------------------------------------------------- duration
    if mcfg.duration.stochastic:
        # SDP returns the per-batch NLL contributions; sum (loss.py:189)
        losses["duration"] = jnp.sum(result["duration_prediction"])
    else:
        log_d = jnp.log(batch["duration"].astype(jnp.float32) + 1.0)
        losses["duration"] = masked_mean_loss(
            result["duration_prediction"], log_d, phone_mask, mcfg.duration.loss
        )

    # --------------------------------------- joint vocoder + speakers
    if "fastdiff" in result:
        eps, z = result["fastdiff"]
        losses["fastdiff"] = masked_mean_loss(eps, z, result["wav_mask"], "mse")
    if result.get("speaker_z") is not None:
        losses["speakers"] = jnp.mean(
            jnp.square(result["speaker_pred"] - result["speaker_z"])
        )

    # ----------------------------------------------------------- total
    weights: Dict[str, float] = {"mel": tcfg.mel_loss_weight,
                                 "duration": mcfg.duration.loss_weight,
                                 "fastdiff": 1e-1, "speakers": 1.0}
    for i, var in enumerate(vcfg.variances):
        w = vcfg.loss_weights[i]
        weights[var] = w
        weights[f"{var}_cwt"] = w
        weights[f"{var}_mean"] = w
        weights[f"{var}_std"] = w

    total = 0.0
    for key, value in losses.items():
        if any(f in key for f in frozen_components):
            continue
        total = total + weights.get(key, 1.0) * value
    losses["total"] = total
    return losses
