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

Two entry points: ``fused_ffn_ln`` (deterministic forwards — bench,
generate, eval) and ``fused_ffn_ln_train`` (training: the same fusion
plus ConvFFN's two dropouts in-kernel via position-hashed masks, with a
custom VJP whose backward recomputes the forward per tile and emits
per-tile weight-grad partials summed by XLA — in-kernel cross-grid
accumulation serializes, the round-2 negative result).

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


def _pos_keep(gpos, n_cols, rate, seed_u32, salt):
    """Stateless keep-mask: a xorshift-multiply hash of (global row
    position, column, seed, salt). Position-keyed — NOT per-program PRNG
    state — so the backward reproduces the forward's mask even with a
    different tile size, and neighboring tiles agree on halo rows. Same
    path compiled and interpreted. Keep probability is (1 - rate)."""
    threshold = jnp.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
    r = gpos.astype(jnp.uint32)                       # (R, 1)
    c = jax.lax.broadcasted_iota(jnp.uint32, (1, n_cols), 1)
    x = r * jnp.uint32(2654435761) ^ (c + jnp.uint32(0x9E3779B9) * jnp.uint32(salt))
    x = x + seed_u32
    x ^= x >> 16
    x *= jnp.uint32(2246822519)
    x ^= x >> 13
    x *= jnp.uint32(3266489917)
    x ^= x >> 16
    return x >= threshold


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


# ---------------------------------------------------------------------------
# training path: same fusion + in-kernel dropout + custom VJP
# ---------------------------------------------------------------------------


def _seed_u32(seed_ref, b):
    return (seed_ref[0].astype(jnp.uint32)
            + b.astype(jnp.uint32) * jnp.uint32(2654435761))


def _ffn_train_kernel(seed_ref, z_hbm, wd_ref, w1_ref, b1_ref, w2_ref,
                      lnp_ref, o_ref, z_vmem, sem,
                      *, k, lpad, tile_m, halo, m_total, eps, rate,
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

    z = z_vmem[:].astype(jnp.float32)
    t1 = _ln(z, g1, be1, eps)
    gpos = (jax.lax.broadcasted_iota(jnp.int32, (tmh, 1), 0)
            + i * tile_m - halo)
    inside = (gpos >= 0) & (gpos < m_total)
    t1 = jnp.where(inside, t1, 0.0)
    t1 = t1.astype(dtype)
    t1f = t1.astype(jnp.float32)

    acc = None
    for j in range(k):
        part = t1f * wd_ref[j, :][None, :]
        part = _roll_rows(part, lpad - j, interpret)
        acc = part if acc is None else acc + part
    acc = acc + bd[None, :]

    h0 = acc[halo:halo + tile_m].astype(dtype)
    up = jax.lax.dot_general(
        h0, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0, :][None, :]
    up = jnp.maximum(up, 0.0).astype(dtype)
    seed = _seed_u32(seed_ref, b)
    gpos_c = gpos[halo:halo + tile_m]
    inv_keep = jnp.float32(1.0 / (1.0 - rate))
    keep1 = _pos_keep(gpos_c, up.shape[1], rate, seed, 1)
    up = jnp.where(keep1, up.astype(jnp.float32) * inv_keep, 0.0).astype(dtype)
    ff = jax.lax.dot_general(
        up, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2p[None, :]
    keep2 = _pos_keep(gpos_c, ff.shape[1], rate, seed, 2)
    ff = jnp.where(keep2, ff * inv_keep, 0.0)

    res = t1f[halo:halo + tile_m] + ff
    out = _ln(res, g2, be2, eps)
    o_ref[0] = out.astype(dtype)


def _ln_bwd(x_f32, dy_g, eps):
    """dx for y_hat = (x - mu) / sigma given dy_g = dy * gamma (both f32,
    stats over axis 1); also returns x_hat."""
    mean = jnp.mean(x_f32, axis=1, keepdims=True)
    mean2 = jnp.mean(x_f32 * x_f32, axis=1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    x_hat = (x_f32 - mean) * inv
    dx = inv * (
        dy_g - jnp.mean(dy_g, axis=1, keepdims=True)
        - x_hat * jnp.mean(dy_g * x_hat, axis=1, keepdims=True)
    )
    return dx, x_hat


def _ffn_train_bwd_kernel(seed_ref, z_hbm, do_hbm, wd_ref, w1_ref, w1T_ref,
                          b1_ref, w2_ref, w2T_ref, lnp_ref,
                          dz_ref, dwd_ref, dw1_ref, dw2_ref, db1_ref,
                          dvec_ref, z_vmem, do_vmem, sems,
                          *, k, lpad, tile_m, H, D, m_total, eps, rate,
                          interpret):
    """Recompute-based backward for one (batch, tile).

    Window layout (rows, all offsets static): z is DMA'd with H = 2D halo
    rows each side; t1 is valid on all W = tile + 2H rows; the FFN chain
    (acc/up/ff/res) is recomputed on the E = tile + 2D interior (the
    depthwise taps reach +-(k-1) <= D); dout is read for the same E rows
    (zero-padded by the wrapper), so LN2/matmul grads exist wherever the
    central tile's depthwise backward needs them. Weight grads are
    per-tile partials summed by XLA outside (cross-grid accumulation
    inside a kernel serializes — the round-2 negative result)."""
    b, i = pl.program_id(0), pl.program_id(1)
    W = tile_m + 2 * H
    E = tile_m + 2 * D
    cps = [
        pltpu.make_async_copy(
            z_hbm.at[b, pl.ds(i * tile_m, W), :], z_vmem, sems.at[0]),
        pltpu.make_async_copy(
            do_hbm.at[b, pl.ds(i * tile_m + (H - D), E), :], do_vmem,
            sems.at[1]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    dtype = dz_ref.dtype
    g1, be1, g2, be2, bd, b2p = (lnp_ref[j, :] for j in range(6))

    # ---- recompute forward over the extended window -----------------
    z = z_vmem[:].astype(jnp.float32)                      # (W, C)
    t1 = _ln(z, g1, be1, eps)
    gpos_w = (jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
              + i * tile_m - H)
    inside_w = (gpos_w >= 0) & (gpos_w < m_total)
    t1 = jnp.where(inside_w, t1, 0.0).astype(dtype)
    t1f = t1.astype(jnp.float32)

    acc = None
    for j in range(k):
        part = t1f * wd_ref[j, :][None, :]
        part = _roll_rows(part, lpad - j, interpret)
        acc = part if acc is None else acc + part
    accE = acc[H - D:H - D + E] + bd[None, :]              # (E, C)

    h0 = accE.astype(dtype)
    up_pre = jax.lax.dot_general(
        h0, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0, :][None, :]                              # (E, F)
    relu_mask = up_pre > 0.0
    upc = jnp.maximum(up_pre, 0.0).astype(dtype)
    seed = _seed_u32(seed_ref, b)
    gpos_e = gpos_w[H - D:H - D + E]
    inv_keep = jnp.float32(1.0 / (1.0 - rate))
    keep1 = _pos_keep(gpos_e, up_pre.shape[1], rate, seed, 1)
    up_d = jnp.where(keep1, upc.astype(jnp.float32) * inv_keep, 0.0
                     ).astype(dtype)
    ff = jax.lax.dot_general(
        up_d, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2p[None, :]                                       # (E, C)
    keep2 = _pos_keep(gpos_e, ff.shape[1], rate, seed, 2)
    ff = jnp.where(keep2, ff * inv_keep, 0.0)
    res = t1f[H - D:H - D + E] + ff

    # ---- backward ----------------------------------------------------
    dy = do_vmem[:].astype(jnp.float32)                    # (E, C)
    dres, rhat = _ln_bwd(res, dy * g2[None, :], eps)
    c0, c1 = D, D + tile_m                                 # central in E
    dg2_p = jnp.sum(dy[c0:c1] * rhat[c0:c1], axis=0)
    dbe2_p = jnp.sum(dy[c0:c1], axis=0)

    dff = jnp.where(keep2, dres * inv_keep, 0.0)
    dup_d = jax.lax.dot_general(
        dff.astype(dtype), w2T_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (E, F)
    dup_pre = jnp.where(keep1, dup_d * inv_keep, 0.0)
    dup_pre = jnp.where(relu_mask, dup_pre, 0.0)
    dacc = jax.lax.dot_general(
        dup_pre.astype(dtype), w1T_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (E, C)

    # weight partials over CENTRAL rows only (each row owned by one tile)
    dw1_ref[0] = jax.lax.dot_general(
        h0[c0:c1], dup_pre[c0:c1].astype(dtype),
        (((0,), (0,)), ((), ())),                          # lhs transpose
        preferred_element_type=jnp.float32,
    )                                                      # (C, F)
    db1_ref[0, 0] = jnp.sum(dup_pre[c0:c1], axis=0)
    dw2_ref[0] = jax.lax.dot_general(
        up_d[c0:c1], dff[c0:c1].astype(dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (F, C)
    db2_p = jnp.sum(dff[c0:c1], axis=0)

    dacc_c = dacc[c0:c1]
    for j in range(k):
        lo = H - lpad + j
        dwd_ref[0, j] = jnp.sum(
            t1f[lo:lo + tile_m] * dacc_c, axis=0)
    dbd_p = jnp.sum(dacc_c, axis=0)

    # depthwise backward into t1 (central rows; dacc reaches +-(k-1) <= D)
    dt1 = dres[c0:c1]
    for j in range(k):
        lo = D + lpad - j
        dt1 = dt1 + dacc[lo:lo + tile_m] * wd_ref[j, :][None, :]
    inside_c = inside_w[H:H + tile_m]
    dt1 = jnp.where(inside_c, dt1, 0.0)

    z_c = z[H:H + tile_m]
    dz, z_hat = _ln_bwd(z_c, dt1 * g1[None, :], eps)
    dg1_p = jnp.sum(dt1 * z_hat, axis=0)
    dbe1_p = jnp.sum(dt1, axis=0)

    dz_ref[0] = dz.astype(dtype)
    dvec_ref[0] = jnp.stack(
        [dg1_p, dbe1_p, dg2_p, dbe2_p, dbd_p, db2_p])


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def fused_ffn_ln_train(z, wd, bd, w1, b1, wg, bg, w2, b2,
                       g1, be1, g2, be2, seed,
                       eps=1e-5, rate=0.1, tile_m=1024, interpret=False):
    """Training twin of ``fused_ffn_ln``: the same fused forward plus the
    XLA path's two dropouts (after ReLU on the (T, F) intermediate and on
    the FFN output, ConvFFN in models/layers.py), with a custom VJP whose
    backward recomputes the forward per tile (flash-attention style) —
    the (B, T, F) intermediate never round-trips HBM in either pass.

    Dropout masks are position-hashed (``_pos_keep``) rather than drawn
    from per-program PRNG state, so forward and backward may tile
    differently and still agree; ``seed`` (int32) selects the draw —
    different stream than nn.Dropout, same Bernoulli(1-rate)/(1-rate)
    semantics."""
    out, _ = _ffn_train_fwd(z, wd, bd, w1, b1, wg, bg, w2, b2,
                            g1, be1, g2, be2, seed,
                            eps, rate, tile_m, interpret)
    return out


def _ffn_train_fwd(z, wd, bd, w1, b1, wg, bg, w2, b2, g1, be1, g2, be2,
                   seed, eps, rate, tile_m, interpret):
    B, T, C = z.shape
    k = wd.shape[0]
    lpad = (k - 1) // 2
    halo = -(-max(lpad, k - 1 - lpad, 1) // 16) * 16
    tile = min(tile_m, -(-T // 16) * 16)
    m_pad = -(-T // tile) * tile

    z_padded = jnp.zeros((B, m_pad + 2 * halo, C), z.dtype)
    z_padded = jax.lax.dynamic_update_slice(z_padded, z, (0, halo, 0))
    w2f, b2f = fold_grouped_into_down(wg, bg, w2, b2)
    lnp = jnp.stack([
        g1.astype(jnp.float32), be1.astype(jnp.float32),
        g2.astype(jnp.float32), be2.astype(jnp.float32),
        bd.astype(jnp.float32), b2f,
    ])

    kernel = functools.partial(
        _ffn_train_kernel, k=k, lpad=lpad, tile_m=tile, halo=halo,
        m_total=T, eps=eps, rate=rate, interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, m_pad // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(
            (1, tile, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, C), z.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, C), z.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32), z_padded,
        wd.astype(jnp.float32), w1[0].astype(z.dtype),
        b1.astype(jnp.float32)[None, :], w2f.astype(z.dtype), lnp,
    )
    return out[:, :T], (z, wd, bd, w1, b1, wg, bg, w2, b2,
                        g1, be1, g2, be2, seed)


def _ffn_train_bwd(eps, rate, tile_m, interpret, saved, dout):
    (z, wd, bd, w1, b1, wg, bg, w2, b2, g1, be1, g2, be2, seed) = saved
    B, T, C = z.shape
    k = wd.shape[0]
    F = w1.shape[2]
    lpad = (k - 1) // 2
    D = -(-max(lpad, k - 1 - lpad, 1) // 16) * 16
    H = 2 * D
    tile = min(256, -(-T // 16) * 16)   # smaller than fwd: (E, F) f32
    m_pad = -(-T // tile) * tile        # intermediates dominate VMEM
    n_t = m_pad // tile

    z_padded = jnp.zeros((B, m_pad + 2 * H, C), z.dtype)
    z_padded = jax.lax.dynamic_update_slice(z_padded, z, (0, H, 0))
    do_padded = jnp.zeros((B, m_pad + 2 * H, C), dout.dtype)
    do_padded = jax.lax.dynamic_update_slice(
        do_padded, dout.astype(dout.dtype), (0, H, 0))

    fold_fn = lambda a, bb, c, d: fold_grouped_into_down(a, bb, c, d)
    (w2f, b2f), fold_vjp = jax.vjp(fold_fn, wg, bg, w2, b2)
    lnp = jnp.stack([
        g1.astype(jnp.float32), be1.astype(jnp.float32),
        g2.astype(jnp.float32), be2.astype(jnp.float32),
        bd.astype(jnp.float32), b2f,
    ])

    kernel = functools.partial(
        _ffn_train_bwd_kernel, k=k, lpad=lpad, tile_m=tile, H=H, D=D,
        m_total=T, eps=eps, rate=rate, interpret=interpret,
    )
    G = B * n_t
    dz, dwd_p, dw1_p, dw2_p, db1_p, dvec_p = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, C), lambda b, i, _n=n_t: (b * _n + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, F), lambda b, i, _n=n_t: (b * _n + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, C), lambda b, i, _n=n_t: (b * _n + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda b, i, _n=n_t: (b * _n + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, C), lambda b, i, _n=n_t: (b * _n + i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, C), z.dtype),
            jax.ShapeDtypeStruct((G, k, C), jnp.float32),
            jax.ShapeDtypeStruct((G, C, F), jnp.float32),
            jax.ShapeDtypeStruct((G, F, C), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, F), jnp.float32),
            jax.ShapeDtypeStruct((G, 6, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * H, C), z.dtype),
            pltpu.VMEM((tile + 2 * D, C), dout.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32), z_padded, do_padded,
        wd.astype(jnp.float32), w1[0].astype(z.dtype),
        jnp.swapaxes(w1[0], 0, 1).astype(z.dtype),
        b1.astype(jnp.float32)[None, :], w2f.astype(z.dtype),
        jnp.swapaxes(w2f, 0, 1).astype(z.dtype), lnp,
    )

    dwd = jnp.sum(dwd_p, axis=0)
    dw1 = jnp.sum(dw1_p, axis=0)[None]
    dw2f = jnp.sum(dw2_p, axis=0)
    db1 = jnp.sum(db1_p, axis=0)[0]
    vecs = jnp.sum(dvec_p, axis=0)
    dg1, dbe1, dg2, dbe2, dbd, db2f = (vecs[j] for j in range(6))
    dwg, dbg, dw2, db2 = fold_vjp((dw2f, db2f))

    def cast_like(g, p):
        return g.astype(p.dtype)

    return (dz[:, :T], cast_like(dwd, wd), cast_like(dbd, bd),
            cast_like(dw1, w1), cast_like(db1, b1),
            cast_like(dwg, wg), cast_like(dbg, bg),
            cast_like(dw2, w2), cast_like(db2, b2),
            cast_like(dg1, g1), cast_like(dbe1, be1),
            cast_like(dg2, g2), cast_like(dbe2, be2),
            jnp.zeros_like(jnp.asarray(seed)))


fused_ffn_ln_train.defvjp(_ffn_train_fwd, _ffn_train_bwd)
