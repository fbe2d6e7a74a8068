"""Fused FastDiff TimeAwareLVCBlock stack — one Pallas program per tile.

FastDiff serving runs 4 eps passes (reference ``litfass/generate.py:38``),
and each pass spends most of its time in the LVC upsample blocks'
per-layer chain (reference ``litfass/third_party/fastdiff/module/
modules.py:167-218``):

    for i in 0..3:  x += audio_down; y = leaky(x); y = dilated_conv_i(y);
                    y = leaky(y); y = LVC(y, K_i); x += sigmoid*tanh(y)

The XLA path round-trips the (B, L, C) activation through HBM ~20 times
per layer (C=32 under-fills both the VPU lanes and the MXU, so nothing
amortizes the traffic), and the round-2 bisect (BASELINE.md) measured the
chain — not the matmuls — as the block's cost. This kernel keeps one
time-tile of ``x`` resident in VMEM across ALL four layers:

- **Halo by neighbor blocks.** Mosaic rejects manual HBM slices whose
  minor dim is not 128-aligned (C=32 here), so instead of a haloed DMA
  the kernel takes each operand THREE times under BlockSpecs whose index
  maps point at the previous/current/next halo block (clamped at the
  edges) and concatenates ``prev | cur | next`` in registers. The halo
  is ``hf`` frames per side, with ``hf`` the smallest divisor of the
  tile frame count whose rows cover the 4 layers' total receptive reach
  of sum(3^i)+4 = 44 samples: late stages (hop >= 44) use hf=1, and the
  hop-8 first stage — which round 3 left on XLA because a one-frame halo
  can't reach — uses hf=8 (64 rows). Rows outside the true signal —
  including the wrong-but-unused data a clamped edge block supplies —
  are masked to zero before each conv (zero-padding semantics), and only
  the central tile is written back.
- **Dilated convs as rolled taps** on the f32 accumulator
  (``roll(y @ W, -s)``), the pallas_hifigan.py idiom.
- **LVC as per-frame MXU matmuls.** The 3 taps fold into the contraction:
  ``(hop, 3C) @ (3C, 2C)`` per frame with the frame's predicted kernel,
  exactly ``location_variable_convolution``'s shifted-slice semantics
  (vocoder/fastdiff.py:102).
- **Gating in-register** — exact sigmoid*tanh or the measured Pade
  rational (vocoder/fastdiff.py:40; BASELINE.md round-3: error below the
  bf16 serving noise floor).

Inference-only (the training path keeps the XLA composition and its
autodiff); gated like the other kernels via ops.kernel_gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU = 0.2


def _roll_rows(h, shift: int, interpret: bool):
    if shift == 0:
        return h
    if interpret:
        return jnp.roll(h, shift, axis=0)
    return pltpu.roll(h, shift=shift % h.shape[0], axis=0)


def _fast_tanh(t):
    # clamped Pade(7,6) — keep in sync with vocoder.fastdiff.fast_tanh
    t = jnp.clip(t, -4.97, 4.97)
    t2 = t * t
    num = t * (135135.0 + t2 * (17325.0 + t2 * (378.0 + t2)))
    den = 135135.0 + t2 * (62370.0 + t2 * (3150.0 + t2 * 28.0))
    return jnp.clip(num / den, -1.0, 1.0)


def _gate(g, C: int, fast: bool):
    a, b = g[:, :C], g[:, C:]
    if fast:
        return (0.5 * (_fast_tanh(0.5 * a) + 1.0)) * _fast_tanh(b)
    return jax.nn.sigmoid(a) * jnp.tanh(b)


def _stack_kernel(xp_ref, xc_ref, xn_ref, ap_ref, ac_ref, an_ref,
                  kp_ref, kc_ref, kn_ref, bp_ref, bc_ref, bn_ref,
                  cw_ref, cb_ref, o_ref,
                  *, layers, hop, F, hf, C, L, fast, interpret):
    it = pl.program_id(1)
    Fe = F + 2 * hf                # frames incl. hf halo frames per side

    # halo rows from hf-frame neighbor blocks (edge tiles get clamped —
    # wrong — data there; those rows have gpos outside [0, L) and are
    # masked to zero before every conv, and never written back)
    x = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]], axis=0)
    ad = jnp.concatenate([ap_ref[0], ac_ref[0], an_ref[0]], axis=0)
    Me = Fe * hop

    gpos = (jax.lax.broadcasted_iota(jnp.int32, (Me, 1), 0)
            + (it * F - hf) * hop)
    inside = (gpos >= 0) & (gpos < L)

    def frame_mats(f, i):
        # frame f of the extended window -> (kernel (3C,2C), bias (1,2C))
        if f < hf:
            return kp_ref[0, f, i], bp_ref[0, f, i]
        if f >= hf + F:
            return kn_ref[0, f - hf - F, i], bn_ref[0, f - hf - F, i]
        return kc_ref[0, f - hf, i], bc_ref[0, f - hf, i]

    for i in range(layers):
        d = 3 ** i
        x = x + ad
        y = jnp.maximum(x, x * LRELU)
        y = jnp.where(inside, y, 0).astype(x.dtype)
        # dilated conv, taps at -d, 0, +d (TorchConv1d same-pad, k=3)
        acc = None
        for j in range(3):
            part = jax.lax.dot_general(
                y, cw_ref[i, j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            part = _roll_rows(part, -(j * d - d), interpret)
            acc = part if acc is None else acc + part
        y = acc + cb_ref[i, :][None, :]
        y = jnp.maximum(y, y * LRELU)
        y = jnp.where(inside, y, 0.0)
        # LVC taps at -1, 0, +1 folded into the contraction
        y3 = jnp.concatenate(
            [_roll_rows(y, 1, interpret), y, _roll_rows(y, -1, interpret)],
            axis=1,
        ).astype(x.dtype)          # (Me, 3C)
        outs = []
        for f in range(Fe):
            kf, bf = frame_mats(f, i)
            seg = y3[f * hop:(f + 1) * hop]            # (hop, 3C)
            g = jax.lax.dot_general(
                seg, kf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bf                                     # (hop, 2C)
            outs.append(_gate(g, C, fast))
        gated = jnp.concatenate(outs, axis=0)          # (Me, C) f32
        x = x + gated.astype(x.dtype)

    o_ref[0] = x[hf * hop:(hf + F) * hop]


def pick_halo_frames(reach: int, hop: int, F: int) -> int | None:
    """Smallest divisor of the tile frame count F whose row span covers
    the layer stack's receptive reach; None when no halo fits (caller
    falls back to the XLA composition). hf=1 for every stage with
    hop >= reach (the round-3 behavior); the hop-8 first stage gets
    hf=8 at F=16."""
    for h in range(1, F + 1):
        if F % h == 0 and h * hop >= reach:
            return h
    return None


def fused_lvc_stack(
    x: jnp.ndarray,            # (B, L, C)
    audio_down: jnp.ndarray,   # (B, L, C)
    kernels: jnp.ndarray,      # (B, nL, layers, C, 2C, ks=3) — model layout
    biases: jnp.ndarray,       # (B, nL, layers, 2C)
    conv_w: jnp.ndarray,       # (layers, ks=3, C, C)
    conv_b: jnp.ndarray,       # (layers, C)
    hop: int,
    fast_gating: bool = False,
    tile_frames: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """All ``layers`` [res + leaky + dilated-conv + leaky + LVC + gate]
    iterations of one TimeAwareLVCBlock, fused per time-tile.

    Semantics match the flax loop in vocoder/fastdiff.py:232-243 (which
    mirrors reference modules.py:197-218) at working-dtype accuracy.
    """
    B, L, C = x.shape
    _, nL, layers, _, C2, ks = kernels.shape
    assert ks == 3 and L == nL * hop and C2 == 2 * C
    reach = sum(3 ** i + 1 for i in range(layers))
    F = min(tile_frames, nL)
    hf = pick_halo_frames(reach, hop, F)
    assert hf is not None, (
        f"layer reach {reach} exceeds the largest halo ({F} frames x "
        f"hop {hop}) available at tile size {F}")
    n_tiles = -(-nL // F)
    nL_pad = n_tiles * F
    xp = jnp.zeros((B, nL_pad * hop, C), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, 0, 0))
    adp = jnp.zeros_like(xp)
    adp = jax.lax.dynamic_update_slice(adp, audio_down.astype(x.dtype),
                                       (0, 0, 0))
    # (B, nL, layers, C, 2C, ks) -> (B, nL, layers, ks*C, 2C): contraction
    # index k*C + cin must match y3's [tap, channel] concat order
    kmat = jnp.transpose(kernels, (0, 1, 2, 5, 3, 4)).reshape(
        B, nL, layers, ks * C, 2 * C).astype(x.dtype)
    kp = jnp.zeros((B, nL_pad, layers, ks * C, 2 * C), x.dtype)
    kp = jax.lax.dynamic_update_slice(kp, kmat, (0, 0, 0, 0, 0))
    bp = jnp.zeros((B, nL_pad, layers, 1, 2 * C), jnp.float32)
    bp = jax.lax.dynamic_update_slice(
        bp, biases[:, :, :, None, :].astype(jnp.float32), (0, 0, 0, 0, 0))

    grid = (B, n_tiles)

    def triple_specs(block_frames, tail_shape, n_blocks_total):
        """(prev, cur, next) BlockSpecs over a frame-blocked array: cur
        covers F frame-units per tile; prev/next are hf frame-units at
        the tile edges (a full neighbor tile would inflate the pipeline
        VMEM for halo rows that are mostly unused), clamped at the array
        edges (clamped data lands on masked rows). Index maps count in
        each spec's own block units: hf | F, so tile i's cur block spans
        halo-block units [i*F/hf, (i+1)*F/hf)."""
        zeros = (0,) * len(tail_shape)
        per_tile = F // hf
        last = n_blocks_total // hf - 1

        def prev(b, i):
            return (b, jnp.maximum(i * per_tile - 1, 0)) + zeros

        def cur(b, i):
            return (b, i) + zeros

        def nxt(b, i):
            return (b, jnp.minimum((i + 1) * per_tile, last)) + zeros

        halo_block = (1, hf * block_frames) + tail_shape
        cur_block = (1, F * block_frames) + tail_shape
        return [
            pl.BlockSpec(halo_block, prev),
            pl.BlockSpec(cur_block, cur),
            pl.BlockSpec(halo_block, nxt),
        ]

    kernel = functools.partial(
        _stack_kernel, layers=layers, hop=hop, F=F, hf=hf, C=C, L=L,
        fast=fast_gating, interpret=interpret,
    )
    # x/ad are hop-row-blocked (nL_pad blocks); kernels/bias frame-blocked
    x_specs = triple_specs(hop, (C,), nL_pad)
    k_specs = triple_specs(1, (layers, ks * C, 2 * C), nL_pad)
    b_specs = triple_specs(1, (layers, 1, 2 * C), nL_pad)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            x_specs + triple_specs(hop, (C,), nL_pad) + k_specs + b_specs
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        ),
        out_specs=pl.BlockSpec(
            (1, F * hop, C), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nL_pad * hop, C), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, adp, adp, adp, kp, kp, kp, bp, bp, bp,
      conv_w.astype(x.dtype), conv_b.astype(jnp.float32))
    return out[:, :L]
