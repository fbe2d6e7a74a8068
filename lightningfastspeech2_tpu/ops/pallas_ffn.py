"""Fused conformer FFN-half Pallas kernel: LN1 -> depthwise conv ->
pointwise-up -> ReLU -> (grouped conv folded into) pointwise-down ->
residual -> LN2, one VMEM-resident program per (batch, time tile).

Why: the decoder FFTStack is the headline forward's bottleneck and its
FFN half is bandwidth-bound, not FLOP-bound. Measured on v5e at
B=8, T=2048, C=256 (scripts/profile_decoder.py): ConvFFN x4 = 2.35 ms and
LayerNorm x8 = 1.31 ms against a ~0.5 ms FLOP/bandwidth bound — XLA runs
the depthwise conv as k separate HBM passes (one per tap) and each
LayerNorm as its own multi-pass reduction, so the block's activations
round-trip HBM ~20x per layer. This kernel reads the (tile + halo, C)
input once, runs everything on VMEM values, and writes one output tile.

Structure notes:
- **Grouped-conv fold.** The reference's conv2 quirk (ConvFFN applies a
  groups=hidden conv over filter_size channels with kernel 1, reference
  ``litfass/fastspeech2/model.py:84-93``) has no nonlinearity between it
  and the pointwise down-projection, so the two compose into ONE
  (F, C) matmul: ``W2' = blockdiag(Wg) @ W2``, ``b2' = b2 + bg @ W2``
  (exact in real arithmetic; computed in f32 at call time). The kernel
  therefore runs two MXU matmuls per tile — (tile, C)@(C, F) and
  (tile, F)@(F, C) — both 128-lane aligned at the flagship C=256,
  F=1024.
- **Depthwise taps by sublane roll.** Like ops/pallas_hifigan.py: the
  caller zero-pads ``halo`` rows (halo >= k//2, rounded to 16) on both
  time edges; tap j is ``roll(t1, -(j - lpad)) * wd[j]`` accumulated in
  f32. Roll wraparound only touches rows provably inside the discarded
  halo.
- **LN semantics match flax.** Stats in f32 (fast variance
  ``max(E[x^2] - E[x]^2, 0)``), normalize + scale + bias in f32, cast to
  the working dtype — the same numerics as ``nn.LayerNorm`` with
  ``dtype=bfloat16`` (flax promotes stats to f32).
- **Signal-edge masking.** Rows outside [0, T) are zeroed AFTER LN1 so
  depthwise taps at sequence edges read zeros, exactly like the XLA
  path's ``jnp.pad`` (LN1 of a zero row is its bias, which must NOT leak
  into edge taps).

No custom VJP: this kernel serves deterministic forwards only (bench,
generate, eval); training keeps the XLA path (models/layers.py gates on
``deterministic``), whose backward is what the flash-attention kernel
already optimizes.

Reference provenance for the fused math: conformer FFN
``litfass/fastspeech2/model.py:73-122`` (depthwise-separable variant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_rows(h, shift: int, interpret: bool):
    if shift == 0:
        return h
    if interpret:
        return jnp.roll(h, shift, axis=0)
    return pltpu.roll(h, shift=shift % h.shape[0], axis=0)


def _ln(x_f32, gamma, beta, eps):
    """flax nn.LayerNorm numerics: f32 fast-variance stats, f32 affine."""
    mean = jnp.mean(x_f32, axis=1, keepdims=True)
    mean2 = jnp.mean(x_f32 * x_f32, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return (x_f32 - mean) * jax.lax.rsqrt(var + eps) * gamma[None, :] + beta[
        None, :
    ]


def _ffn_kernel(z_hbm, wd_ref, w1_ref, b1_ref, w2_ref, lnp_ref, o_ref,
                z_vmem, sem, *, k, lpad, tile_m, halo, m_total, eps,
                interpret):
    b, i = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(
        z_hbm.at[b, pl.ds(i * tile_m, tile_m + 2 * halo), :], z_vmem, sem
    )
    cp.start()
    cp.wait()

    tmh = tile_m + 2 * halo
    dtype = o_ref.dtype
    g1, be1, g2, be2, bd, b2p = (lnp_ref[j, :] for j in range(6))

    z = z_vmem[:].astype(jnp.float32)  # (tmh, C)
    t1 = _ln(z, g1, be1, eps)
    # zero rows outside the real signal so edge taps read zeros (the XLA
    # path zero-pads the LN1 OUTPUT before the depthwise conv)
    gpos = (jax.lax.broadcasted_iota(jnp.int32, (tmh, 1), 0)
            + i * tile_m - halo)
    inside = (gpos >= 0) & (gpos < m_total)
    t1 = jnp.where(inside, t1, 0.0)
    # round to the working dtype like the XLA path's bf16 LN output
    t1 = t1.astype(dtype)
    t1f = t1.astype(jnp.float32)

    # depthwise conv: out[r] = sum_j t1[r + j - lpad] * wd[j]
    acc = None
    for j in range(k):
        part = t1f * wd_ref[j, :][None, :]
        part = _roll_rows(part, lpad - j, interpret)
        acc = part if acc is None else acc + part
    acc = acc + bd[None, :]

    h0 = acc[halo:halo + tile_m].astype(dtype)  # (tile_m, C)
    up = jax.lax.dot_general(
        h0, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0, :][None, :]
    up = jnp.maximum(up, 0.0).astype(dtype)
    ff = jax.lax.dot_general(
        up, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2p[None, :]

    res = t1f[halo:halo + tile_m] + ff
    out = _ln(res, g2, be2, eps)
    o_ref[0] = out.astype(dtype)


def fold_grouped_into_down(wg, bg, w2, b2):
    """Compose the k=1 grouped conv (F -> F, G groups) with the pointwise
    down-projection (F -> C) into one (F, C) matmul; exact (both linear,
    nothing between them). f32 math."""
    _, G, ci, co = wg.shape
    w2m = w2[0].astype(jnp.float32)            # (F, C)
    F, C = w2m.shape
    w2g = w2m.reshape(G, co, C)
    w2f = jnp.einsum(
        "gio,goc->gic", wg[0].astype(jnp.float32), w2g
    ).reshape(G * ci, C)
    b2f = b2.astype(jnp.float32) + bg.astype(jnp.float32) @ w2m
    return w2f, b2f


def fused_ffn_ln(
    z: jnp.ndarray,        # (B, T, C): attention residual sum x + sa
    wd: jnp.ndarray,       # (k, C) depthwise kernel
    bd: jnp.ndarray,       # (C,)
    w1: jnp.ndarray,       # (1, C, F) conv1_point kernel
    b1: jnp.ndarray,       # (F,)
    wg: jnp.ndarray,       # (1, G, ci, co) conv2_group kernel (k=1)
    bg: jnp.ndarray,       # (F,)
    w2: jnp.ndarray,       # (1, F, C) conv2_point kernel
    b2: jnp.ndarray,       # (C,)
    g1: jnp.ndarray, be1: jnp.ndarray,   # norm1 scale/bias (C,)
    g2: jnp.ndarray, be2: jnp.ndarray,   # norm2 scale/bias (C,)
    eps: float = 1e-5,
    tile_m: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """LN2(LN1(z) + ConvFFN(LN1(z))) fused; drop-in for the FFN half of
    models.layers.FFTBlock (deterministic, depthwise, kernel2 == 1)."""
    B, T, C = z.shape
    k = wd.shape[0]
    lpad = (k - 1) // 2
    halo = -(-max(lpad, k - 1 - lpad, 1) // 16) * 16
    tile_m = min(tile_m, -(-T // 16) * 16)
    m_pad = -(-T // tile_m) * tile_m

    z_padded = jnp.zeros((B, m_pad + 2 * halo, C), z.dtype)
    z_padded = jax.lax.dynamic_update_slice(z_padded, z, (0, halo, 0))

    w2f, b2f = fold_grouped_into_down(wg, bg, w2, b2)
    lnp = jnp.stack([
        g1.astype(jnp.float32), be1.astype(jnp.float32),
        g2.astype(jnp.float32), be2.astype(jnp.float32),
        bd.astype(jnp.float32), b2f,
    ])  # (6, C)

    kernel = functools.partial(
        _ffn_kernel, k=k, lpad=lpad, tile_m=tile_m, halo=halo, m_total=T,
        eps=eps, interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, C), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, C), z.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m + 2 * halo, C), z.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        z_padded,
        wd.astype(jnp.float32),
        w1[0].astype(z.dtype),
        b1.astype(jnp.float32)[None, :],
        w2f.astype(z.dtype),
        lnp,
    )
    return out[:, :T]
