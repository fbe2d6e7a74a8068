"""Length regulation: expand phone-level states to frame level by duration.

The reference loops ``torch.repeat_interleave`` per batch item and pads
(reference ``litfass/fastspeech2/model.py:344-370``) — a ragged host-style
op. TPU-native formulation: with static output length T, frame t of item b
copies phone ``searchsorted(cumsum(durations[b]), t, side='right')``; one
vectorized gather, no ragged shapes, grad flows through the gather as a
segment-sum (exactly repeat_interleave's transpose).

Semantics parity with the reference (tested in
tests/test_length_regulator.py):
- output length = min(max(sum(durations)), max_length) there; here the
  static bucket T plays max_length and a mask marks valid frames,
- frames past an item's total duration are zero (they pad with 0 there),
- the mask is True for VALID frames (note: the reference's mask is the
  inverse — True means padding).

Also provides the zero-duration rescue used at inference
(``model.py:306-309``) and duration rounding rules (``model.py:296-305``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lightningfastspeech2_tpu.ops.kernel_gate import pallas_enabled


def regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand ``x`` (B, P, H) by ``durations`` (B, P) to (B, T, H), T =
    ``max_frames`` static; returns (frames, frame_mask) with frame_mask
    True at valid frames.

    Works for feature vectors (B, P, H) and scalar sequences (B, P).
    """
    # Opt-in only: with the kernel gate fixed (it used to be silently
    # poisoned off inside jit traces), a real A/B at flagship shapes
    # (B=8, P=256, T=2048, H=256) shows the XLA compare-and-sum path is
    # faster than the one-hot-MXU kernel — the (T, P) compare matrix is
    # one fused VPU reduction while the kernel pays per-tile one-hot
    # matmuls. Keep the kernel for parity/portability behind
    # LFS2_PALLAS_LR=1. Read at TRACE time (jit caches don't key on env
    # vars): set before the first trace — see ops/kernel_gate.py.
    import os

    lr_opt_in = os.environ.get("LFS2_PALLAS_LR", "0").lower() in (
        "1", "true", "on",
    )
    if (lr_opt_in and pallas_enabled() and x.ndim == 3
            and max_frames % 256 == 0):
        from lightningfastspeech2_tpu.ops.kernel_gate import pallas_interpret
        from lightningfastspeech2_tpu.ops.pallas_length_regulator import (
            regulate_pallas,
        )

        return regulate_pallas(
            x, durations, max_frames, interpret=pallas_interpret()
        )
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    durations = jnp.maximum(durations, 0).astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=-1)  # (B, P)
    t = jnp.arange(max_frames, dtype=jnp.int32)

    # phone index owning frame t: number of ends <= t. Computed as a
    # compare-and-sum instead of searchsorted — 2.5x faster on TPU (XLA's
    # searchsorted lowering is scalar-heavy; the (T, P) compare matrix is a
    # single fused VPU reduction)
    idx = jnp.sum(
        (ends[:, None, :] <= t[None, :, None]).astype(jnp.int32), axis=-1
    )
    total = ends[:, -1]
    mask = t[None, :] < jnp.minimum(total, max_frames)[:, None]

    idx_clamped = jnp.minimum(idx, x.shape[1] - 1)
    frames = jnp.take_along_axis(x, idx_clamped[:, :, None], axis=1)
    frames = jnp.where(mask[:, :, None], frames, 0)
    if squeeze:
        frames = frames[..., 0]
    return frames, mask


def round_durations_deterministic(log_duration_pred: jnp.ndarray) -> jnp.ndarray:
    """Inference rounding for the deterministic predictor:
    round(exp(pred) - 1), clamped >= 0 (model.py:300,305)."""
    return jnp.maximum(jnp.round(jnp.exp(log_duration_pred) - 1.0), 0.0).astype(
        jnp.int32
    )


def round_durations_stochastic(log_duration_pred: jnp.ndarray) -> jnp.ndarray:
    """Inference rounding for the SDP: ceil(exp(pred)), zeros stay zero,
    clamped >= 0 (model.py:302-305)."""
    rounded = jnp.ceil(jnp.exp(log_duration_pred + 1e-9))
    rounded = jnp.where(log_duration_pred == 0, 0.0, rounded)
    return jnp.maximum(rounded, 0.0).astype(jnp.int32)


def rescue_zero_durations(
    durations: jnp.ndarray, phone_mask: jnp.ndarray
) -> jnp.ndarray:
    """If an utterance's total duration <= half its phone count, set all its
    valid phones to duration 1 (model.py:306-309). phone_mask True=valid."""
    total = jnp.sum(jnp.where(phone_mask, durations, 0), axis=-1)
    n_phones = jnp.sum(phone_mask, axis=-1)
    degenerate = total <= n_phones // 2
    ones = jnp.where(phone_mask, 1, durations)
    return jnp.where(degenerate[:, None], ones, durations)
