"""Fused HiFi-GAN resblock Pallas kernel.

The vocoder dominates real synthesis cost, and a per-stage profile on v5e
(B=4, Tmel=1024, bf16) shows where its time goes: the late resblock
stages run at tiny MFU because their channel counts under-fill the MXU's
128 output lanes —

    resblocks C=256 L= 8192    5.7 ms   (~48% MFU)
    resblocks C=128 L=65536   16.3 ms   (~34% MFU)
    resblocks C= 64 L=131072  27.7 ms   (~10% MFU)
    resblocks C= 32 L=262144  43.8 ms   ( ~3% MFU)

This kernel executes one whole ResBlock1 (reference
``litfass/third_party/hifigan/models.py:20-93``: three [leaky -> dilated
conv -> leaky -> conv] residual pairs) as a single Mosaic program per
(batch, time-tile):

- **Lane-filling layout.** For C < 128 the caller folds time into lanes:
  ``(B, L, C) -> (B, L/f, f*C)`` with ``f = 128/C`` — a contiguous (free)
  XLA reshape. Each dilated conv becomes a short stack of
  ``(tile, f*C) @ (f*C, f*C)`` matmuls over "block taps" (the folded
  structured-sparse kernel of ``vocoder.hifigan.conv1d_folded``). The
  zero blocks waste ~2.3x FLOPs at f=4 but the full 128x128 MXU shape
  wins ~4x net over the lane-starved dense conv. For C >= 128 the taps
  are the plain dilated-conv taps (no fold, no waste).
- **VMEM residency.** The six convs, leaky_relus and residual adds of a
  resblock never round-trip to HBM: the input tile is DMA'd in once
  (with halo), everything runs on VMEM values, one output tile is
  written back.
- **Halo by roll.** The caller zero-pads H blocks on both time edges;
  each tap is applied as ``roll(x, -shift) @ W[tap]`` with f32
  accumulation. Roll wraparound only corrupts rows that are provably
  inside the discarded halo (corruption grows by max(|shift|) per conv;
  H is the sum over convs).

Matmuls accumulate in f32; bias-add and leaky_relu(0.1) run in f32
before casting back to the working dtype, matching the XLA path's
conv-accumulator behaviour.

Weight/semantics provenance: reference ``models.py:20-93`` (ResBlock1),
``models.py:112-165`` (stage structure the caller mirrors).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def tap_blocks(w: jnp.ndarray, dilation: int, fold: int):
    """Decompose a dilated conv kernel into MXU-shaped block taps.

    w (k, C, C) -> (W_blocks (n_taps, f*C, f*C), shifts tuple[int]) such
    that for a folded signal xf (M, f*C):

        y[m] = sum_t xf[m + shifts[t]] @ W_blocks[t]

    equals the folded same-padded dilated conv. fold == 1 returns the
    plain taps at shifts (j*d - p).
    """
    k, C, _ = w.shape
    p = dilation * (k - 1) // 2
    if fold == 1:
        return w, tuple(j * dilation - p for j in range(k))
    d, f = dilation, fold
    left = -(-p // f)
    right = (f - 1 + p) // f
    nb = left + right + 1
    t_idx, qr_idx, r_idx, j_idx = [], [], [], []
    for r in range(f):
        for j in range(k):
            delta = r - p + d * j
            t_idx.append(delta // f + left)
            qr_idx.append(delta % f)
            r_idx.append(r)
            j_idx.append(j)
    W2 = jnp.zeros((nb, f, C, f, C), w.dtype)
    W2 = W2.at[
        jnp.asarray(t_idx), jnp.asarray(qr_idx), :, jnp.asarray(r_idx), :
    ].set(w[jnp.asarray(j_idx)])
    return (
        W2.reshape(nb, f * C, f * C),
        tuple(int(s) for s in range(-left, right + 1)),
    )


def _roll_rows(h, shift: int, interpret: bool):
    if shift == 0:
        return h
    if interpret:
        return jnp.roll(h, shift, axis=0)
    return pltpu.roll(h, shift=shift % h.shape[0], axis=0)


def _resblock_kernel(*refs, shifts, tile_m, halo, m_total, interpret):
    n = len(shifts)  # number of convs (2 per residual pair)
    x_hbm, w_refs, (bias_ref, o_ref, x_vmem, sem) = (
        refs[0], refs[1:1 + n], refs[1 + n:])
    b, i = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_m, tile_m + 2 * halo), :], x_vmem, sem
    )
    cp.start()
    cp.wait()

    x = x_vmem[:]  # (tile_m + 2*halo, D), working dtype
    tmh = tile_m + 2 * halo
    # rows mapping outside the real signal [0, m_total): every conv's
    # input must be zero there (torch zero-pads EACH conv at the true
    # signal edges, so intermediates outside the signal are zero, not
    # bias/leaky chains) — mask conv outputs back to zero on those rows
    gpos = (jax.lax.broadcasted_iota(jnp.int32, (tmh, 1), 0)
            + i * tile_m - halo)
    inside = (gpos >= 0) & (gpos < m_total)

    def conv(h, conv_idx):
        # roll(h, -s) @ W == roll(h @ W, -s): matmul first so the rolls
        # run on the f32 accumulator (Mosaic has no bf16 rotate)
        acc = None
        for t, s in enumerate(shifts[conv_idx]):
            part = jax.lax.dot_general(
                h, w_refs[conv_idx][t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            part = _roll_rows(part, -s, interpret)
            acc = part if acc is None else acc + part
        return jnp.where(inside, acc + bias_ref[conv_idx, :][None, :], 0.0)

    for pair in range(n // 2):
        # leaky_relu(x) = max(x, slope*x) for slope<1 — comparison-free
        # (Mosaic lacks bf16 vector compares on this target)
        t = jnp.maximum(x, x * LRELU_SLOPE)
        t = conv(t, 2 * pair)
        t = jnp.maximum(t, t * LRELU_SLOPE)
        t = conv(t.astype(x.dtype), 2 * pair + 1)
        x = x + t.astype(x.dtype)

    o_ref[0] = x[halo:halo + tile_m]


def fused_resblock(
    xf: jnp.ndarray,                       # (B, M, D) folded signal
    weights: Sequence[jnp.ndarray],        # 6x (n_taps_i, D, D)
    shifts: Sequence[Tuple[int, ...]],     # 6x static tap shifts
    biases: jnp.ndarray,                   # (6, D) f32, fold-tiled
    tile_m: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one ResBlock1 (6 convs as block taps) fused in VMEM.

    Conv order: convs1_0, convs2_0, convs1_1, convs2_1, convs1_2,
    convs2_2 (the reference applies leaky->convs1_i->leaky->convs2_i
    with a residual add per pair, models.py:74-87).
    """
    B, M, D = xf.shape
    halo = sum(max(-min(s), max(s)) for s in shifts)
    halo = -(-halo // 16) * 16
    tile_m = min(tile_m, -(-M // 16) * 16)
    m_pad = -(-M // tile_m) * tile_m
    x_padded = jnp.zeros((B, m_pad + 2 * halo, D), xf.dtype)
    x_padded = jax.lax.dynamic_update_slice(x_padded, xf, (0, halo, 0))

    grid = (B, m_pad // tile_m)
    kernel = functools.partial(
        _resblock_kernel,
        shifts=tuple(tuple(s) for s in shifts),
        tile_m=tile_m, halo=halo, m_total=M, interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(weights) + 1),
        out_specs=pl.BlockSpec(
            (1, tile_m, D), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, D), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m + 2 * halo, D), xf.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_padded, *[w for w in weights], biases.astype(jnp.float32))
    return out[:, :M]


def _resblock_trio_kernel(*refs, shifts, n_res, tile_m, halo, m_total,
                          interpret):
    """All three resblocks of one stage from a single input DMA.

    ``shifts`` concatenates the per-conv shift tuples of the ``n_res``
    resblocks (6 convs each); the outputs are averaged in VMEM so the
    stage's trio costs one HBM read + one write instead of three reads,
    three writes and an XLA average pass."""
    n = len(shifts)
    x_hbm, w_refs, (bias_ref, o_ref, x_vmem, sem) = (
        refs[0], refs[1:1 + n], refs[1 + n:])
    b, i = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_m, tile_m + 2 * halo), :], x_vmem, sem
    )
    cp.start()
    cp.wait()

    x0 = x_vmem[:]  # (tile_m + 2*halo, D), working dtype
    tmh = tile_m + 2 * halo
    gpos = (jax.lax.broadcasted_iota(jnp.int32, (tmh, 1), 0)
            + i * tile_m - halo)
    inside = (gpos >= 0) & (gpos < m_total)

    def conv(h, conv_idx):
        acc = None
        for t, s in enumerate(shifts[conv_idx]):
            part = jax.lax.dot_general(
                h, w_refs[conv_idx][t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            part = _roll_rows(part, -s, interpret)
            acc = part if acc is None else acc + part
        return jnp.where(inside, acc + bias_ref[conv_idx, :][None, :], 0.0)

    n_pairs = n // (2 * n_res)
    out = None
    for r in range(n_res):
        x = x0
        for pair in range(n_pairs):
            ci = r * 2 * n_pairs + 2 * pair
            t = jnp.maximum(x, x * LRELU_SLOPE)
            t = conv(t, ci)
            t = jnp.maximum(t, t * LRELU_SLOPE)
            t = conv(t.astype(x.dtype), ci + 1)
            x = x + t.astype(x.dtype)
        out = x if out is None else out + x
    out = out / float(n_res)
    o_ref[0] = out[halo:halo + tile_m].astype(o_ref.dtype)


def fused_resblock_trio(
    xf: jnp.ndarray,                          # (B, M, D) folded signal
    weights: Sequence[jnp.ndarray],           # n_res*6 x (n_taps_i, D, D)
    shifts: Sequence[Tuple[int, ...]],        # n_res*6 static tap shifts
    biases: jnp.ndarray,                      # (n_res*6, D) f32, fold-tiled
    n_res: int = 3,
    tile_m: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run a whole stage's resblock group (reference ``models.py:141-151``:
    mean over three ResBlock1 outputs) fused in VMEM.

    Weight/shift/bias sequences are the per-resblock ``resblock_taps``
    results concatenated in resblock order. Only legal where all
    ``n_res*6`` tap stacks fit VMEM (D <= 128 for the HiFi-GAN V1 trio);
    the C=256 first stage must stay on per-resblock ``fused_resblock``."""
    B, M, D = xf.shape
    per = len(shifts) // n_res
    halo = max(
        sum(max(-min(s), max(s)) for s in shifts[r * per:(r + 1) * per])
        for r in range(n_res)
    )
    halo = -(-halo // 16) * 16
    tile_m = min(tile_m, -(-M // 16) * 16)
    m_pad = -(-M // tile_m) * tile_m
    x_padded = jnp.zeros((B, m_pad + 2 * halo, D), xf.dtype)
    x_padded = jax.lax.dynamic_update_slice(x_padded, xf, (0, halo, 0))

    grid = (B, m_pad // tile_m)
    kernel = functools.partial(
        _resblock_trio_kernel,
        shifts=tuple(tuple(s) for s in shifts),
        n_res=n_res, tile_m=tile_m, halo=halo, m_total=M,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(weights) + 1),
        out_specs=pl.BlockSpec(
            (1, tile_m, D), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, D), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_m + 2 * halo, D), xf.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_padded, *[w for w in weights], biases.astype(jnp.float32))
    return out[:, :M]


def resblock_taps(params, kernel_size: int, dilations: Tuple[int, ...],
                  fold: int, dtype):
    """Prepare (weights, shifts, biases) for ``fused_resblock`` from a
    ResBlock1 param subtree ({convs1_i, convs2_i: {kernel, bias}})."""
    weights, shift_list, biases = [], [], []
    for i in range(len(dilations)):
        for branch, d in ((f"convs1_{i}", dilations[i]), (f"convs2_{i}", 1)):
            w = jnp.asarray(params[branch]["kernel"], dtype)
            b = jnp.asarray(params[branch]["bias"], jnp.float32)
            W, s = tap_blocks(w, d, fold)
            weights.append(W)
            shift_list.append(s)
            biases.append(jnp.tile(b, fold))
    return weights, shift_list, jnp.stack(biases)
