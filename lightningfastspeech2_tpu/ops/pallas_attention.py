"""Pallas TPU flash attention for the FFT-block self-attention.

The decoder attends over T≈2048 mel frames with head_dim 128; the naive
formulation (reference torch ``nn.MultiheadAttention`` inside
``litfass/fastspeech2/model.py:108-116``) materializes the (B, h, T, T)
score tensor in HBM several times per layer — at these shapes the op is
memory-bound, not FLOP-bound. This kernel never writes scores to HBM:
each program owns one query tile and the full K/V for its (batch, head),
computes scores -> key-padding mask -> softmax -> P@V entirely in VMEM,
with f32 accumulation on the MXU. K/V at T=2048, d=128 in bf16 are 512 KB
each — far under the ~16 MB VMEM budget, so no online-softmax carry is
needed (single-pass per row).

Mosaic matmul layout rule this file is built around: ``tpu.matmul``
supports a native lhs transpose but lowers an rhs transpose via an
explicit (slow) vector transpose — measured 68 ms vs 5 ms for the same
kernel at B=8, T=2048. Every dot_general below therefore contracts rhs
dim 0; K and V are passed in BOTH (T, d) and pre-transposed (d, T)
layouts (one cheap XLA transpose outside the kernel) so forward uses
q @ kT and backward uses do @ vT / ds @ k / lhs-transposed reductions.

Backward recomputes P per query tile (no stored probabilities) and
accumulates dK/dV across query tiles inside the kernel, wired through
``jax.custom_vjp``.

NEGATIVE RESULT (round 5, on-chip): the round-4 "split backward" idea —
a q-tiled dQ pass plus a K-MAJOR dK/dV pass writing each tile once from
LSE-reconstructed probabilities — is unbuildable on this toolchain: its
dv contraction (Tk, T) @ (T, d) at Tk=256, T=2048 hangs/aborts the TPU
AOT compile helper (libtpu Mosaic pipeline), while cross-lowering and
interpret-mode parity both pass. Minimal repro committed as
scripts/repro_split_bwd_hang.py; the split path and its LFS2_ATTN_SPLIT_BWD
flag were deleted per VERDICT r4 item 6 ("measure ... or record the
negative and delete"). Fused backward measured 24.15 ms/step full-grad
at B=8 P=256 T=2048 (scripts/ab_split_bwd.py).

Attention-prob dropout (the reference trains with p=0.1) runs inside the
kernel via the TPU PRNG, seeded per (batch, head, q-tile); the backward
kernel reseeds identically, so the dropped positions match without ever
materializing the mask.

Semantics match models.layers.SelfAttention exactly: scores scaled by
1/sqrt(d), keys masked where ``mask`` is False (queries are NOT masked —
padded queries attend valid keys, like torch's key_padding_mask).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _dropout_keep(shape, rate, seed_bh, row0):
    """Tiling-INVARIANT keep mask at probability (1 - rate).

    Counter-based xorshift-multiply hash keyed on the GLOBAL (query row,
    key col) coordinates plus a per-(batch, head) seed. Any kernel tiling
    — forward q-tiles, or backward q-tiles of a different size —
    reproduces the identical mask by passing its block's global row
    offset.

    This replaced the per-tile hardware-PRNG scheme in round 4: the
    forward picks Tq=512 under dropout at T=2048 while the backward's
    VMEM budget forces Tq=256, so tile-indexed seeding produced DIFFERENT
    masks in forward and backward (biased dropout gradients at exactly
    the decoder's training shape). Position hashing is the same recipe
    the fused-FFN training kernel uses (ops/pallas_ffn.py).
    """
    threshold = jnp.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(2654435761)) ^ (c * jnp.uint32(1013904223))
    x = x + seed_bh.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(2246822519)
    x ^= x >> 13
    x *= jnp.uint32(3266489917)
    x ^= x >> 16
    return x >= threshold


def _probs(q, kT, key_valid, scale):
    """(Tq, T) softmax(scale * q kT) with key-padding mask, f32."""
    s = jax.lax.dot_general(
        q, kT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(key_valid[None, :], s, NEG_INF)
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _fwd_kernel(mask_ref, seed_ref, q_ref, kT_ref, v_ref, o_ref,
                *, scale, rate, interpret):
    b, h, qt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    s = jax.lax.dot_general(
        q_ref[0, 0], kT_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where((mask_ref[b, :] > 0)[None, :], s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    s = s - m
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=1, keepdims=True)
    if rate > 0.0:
        seed_bh = seed_ref[0] + b * pl.num_programs(1) + h
        keep = _dropout_keep(p.shape, rate, seed_bh,
                             qt * p.shape[0])
        p = jnp.where(keep, p, 0.0)
    v = v_ref[0, 0]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # normalization (and the dropout 1/keep) folded into the (Tq, d)
    # output instead of a full (Tq, T) pass over P
    o = o / (denom * (1.0 - rate) if rate > 0.0 else denom)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(mask_ref, seed_ref, q_ref, k_ref, kT_ref, vT_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, rate, interpret):
    b, h, qt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q = q_ref[0, 0]          # (Tq, d)
    k = k_ref[0, 0]          # (T, d)
    do = do_ref[0, 0]        # (Tq, d)

    p = _probs(q, kT_ref[0, 0], mask_ref[b, :] > 0, scale)  # (Tq, T) f32

    if rate > 0.0:
        seed_bh = seed_ref[0] + b * pl.num_programs(1) + h
        keep = _dropout_keep(p.shape, rate, seed_bh,
                             qt * p.shape[0])
        p_drop = jnp.where(keep, p, 0.0) / (1.0 - rate)
    else:
        p_drop = p

    # dV = P_drop^T dO — native lhs transpose (contract q-dim of both)
    dv = jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dP_drop = dO V^T -> dO @ vT, rhs contracts dim 0
    dp = jax.lax.dot_general(
        do, vT_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dp = jnp.where(keep, dp, 0.0) / (1.0 - rate)
    # softmax vjp: dS = P * (dP - sum(dP * P, axis=-1)); scale folds in
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True)) * scale

    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dK = dS^T Q — native lhs transpose
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(qt == 0)
    def _():
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(qt > 0)
    def _():
        dk_ref[0, 0] = dk_ref[0, 0] + dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_ref[0, 0] + dv.astype(dv_ref.dtype)


def _pick_q_tile(T: int, rate: float = 0.0, cap: int = 1024) -> int:
    # Forward: largest tile wins (fewer programs -> less fixed overhead),
    # but the live (Tq, T) 4-byte intermediates must fit scoped VMEM with
    # margin: 1 block (f32 scores) deterministic, 2 blocks when dropout is
    # on (scores + PRNG random bits).  Budgeting them at 8 MB keeps the
    # total request well under the 16 MB limit: at T=2048 the dropout
    # forward with Tq=1024 requests 16.07M and FAILS by 76K under the
    # driver's flags (same marginal-VMEM class as the round-2 bwd crash);
    # Tq=512 fits with ~8 MB to spare.
    budget = 8 * 1024 * 1024
    blocks = 2 if rate > 0.0 else 1
    for t in (1024, 512, 256, 128):
        if t <= cap and T % t == 0 and blocks * t * T * 4 <= budget:
            return t
    raise ValueError(f"sequence length {T} not a multiple of 128")


def _pick_bwd_q_tile(T: int) -> int:
    # The backward keeps THREE (Tq, T) f32 intermediates live at once
    # (p, dp, ds) plus ~4 MB of (T, d) K/V blocks and dK/dV accumulators,
    # all inside the 16 MB scoped-VMEM limit.  Budget the intermediates at
    # 8 MB so the whole allocation lands well under the limit regardless
    # of the runner's VMEM configuration.  Measured on v5e at T=2048:
    # Tq=512 requests 16.53M total and FAILS under the driver's flags
    # (this exact overflow crashed the round-2 bench); Tq=256 requests
    # ~10.3M and fits with margin.
    budget = 8 * 1024 * 1024
    for t in (512, 256, 128):
        if T % t == 0 and 3 * t * T * 4 <= budget:
            return t
    raise ValueError(f"sequence length {T} not a multiple of 128")


def _fwd(q, k, v, mask, seed, scale, rate, interpret):
    B, H, T, d = q.shape
    Tq = _pick_q_tile(T, rate)
    kT = jnp.swapaxes(k, 2, 3)  # (B, H, d, T), one XLA transpose in HBM
    qtile = pl.BlockSpec((1, 1, Tq, d), lambda b, h, qt: (b, h, qt, 0))
    kT_spec = pl.BlockSpec((1, 1, d, T), lambda b, h, qt: (b, h, 0, 0))
    v_spec = pl.BlockSpec((1, 1, T, d), lambda b, h, qt: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, rate=rate, interpret=interpret
        ),
        grid=(B, H, T // Tq),
        in_specs=[
            pl.BlockSpec((B, T), lambda b, h, qt: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qtile, kT_spec, v_spec,
        ],
        out_specs=qtile,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(mask.astype(jnp.int32), jnp.asarray([seed], jnp.int32), q, kT, v)


def _bwd(q, k, v, mask, seed, do, scale, rate, interpret):
    B, H, T, d = q.shape
    Tq = _pick_bwd_q_tile(T)
    kT = jnp.swapaxes(k, 2, 3)
    vT = jnp.swapaxes(v, 2, 3)
    qtile = pl.BlockSpec((1, 1, Tq, d), lambda b, h, qt: (b, h, qt, 0))
    full_td = pl.BlockSpec((1, 1, T, d), lambda b, h, qt: (b, h, 0, 0))
    full_dt = pl.BlockSpec((1, 1, d, T), lambda b, h, qt: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, rate=rate, interpret=interpret
        ),
        grid=(B, H, T // Tq),
        in_specs=[
            pl.BlockSpec((B, T), lambda b, h, qt: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qtile, full_td, full_dt, full_dt, qtile,
        ],
        out_specs=(qtile, full_td, full_td),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(mask.astype(jnp.int32), jnp.asarray([seed], jnp.int32),
      q, k, kT, vT, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_core(q, k, v, mask, seed, scale, rate, interpret):
    return _fwd(q, k, v, mask, seed, scale, rate, interpret)


def _flash_fwd(q, k, v, mask, seed, scale, rate, interpret):
    o = _fwd(q, k, v, mask, seed, scale, rate, interpret)
    return o, (q, k, v, mask, seed)


def _flash_bwd(scale, rate, interpret, res, do):
    q, k, v, mask, seed = res
    dq, dk, dv = _bwd(q, k, v, mask, seed, do, scale, rate, interpret)
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,           # (B, h, T, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,   # (B, T) True = valid KEY
    dropout_rate: float = 0.0,
    seed: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused softmax(q k^T / sqrt(d)) v with key-padding masking; drop-in
    for the einsum attention in models.layers.SelfAttention."""
    B, H, T, d = q.shape
    if mask is None:
        mask = jnp.ones((B, T), bool)
    scale = 1.0 / (d ** 0.5)
    return _flash_core(q, k, v, mask, jnp.asarray(seed, jnp.int32),
                       scale, float(dropout_rate), interpret)
