"""Pallas TPU kernel for the length-regulator expand.

THE ragged op of FastSpeech2 (reference ``litfass/fastspeech2/model.py:
344-370`` loops per-item ``repeat_interleave``; SURVEY.md hard part #1,
BASELINE.json asks for this kernel at speed-of-light). Formulation: frame t
of item b copies phone ``p(t) = #{ends <= t}``; instead of a row gather the
kernel builds the one-hot matrix ``onehot[t, p] = (p == p(t))`` on the VPU
and multiplies ``onehot @ x`` on the MXU — a (T_tile x P) x (P x H) matmul
per tile, which both saturates the hardware and makes the backward pass the
transposed matmul ``onehot^T @ g`` (exactly repeat_interleave's adjoint
segment-sum).

Grid: (B, T // T_TILE). Forward and backward are separate pallas_calls
wired through jax.custom_vjp. ``interpret=True`` runs on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 256


def _expand_kernel(ends_ref, x_ref, out_ref):
    """One (b, t_tile) block: out[t] = x[searchsorted(ends, t, 'right')]."""
    b = pl.program_id(0)
    tt = pl.program_id(1)
    P = x_ref.shape[1]
    T_tile = out_ref.shape[1]

    # ends arrives unblocked (Mosaic requires sublane blocks of 8 or the
    # full array; B is small so the whole (B, P) table rides along)
    ends = ends_ref[b, :]  # (P,) int32
    t0 = tt * T_tile
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T_tile, P), 0) + t0
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (T_tile, P), 1)

    # phone index per frame: number of ends <= t
    idx = jnp.sum((ends[None, :] <= t_idx).astype(jnp.int32), axis=1,
                  keepdims=True)  # (T_tile, 1)
    idx = jnp.minimum(idx, P - 1)
    total = ends[P - 1]

    onehot = (p_idx == idx).astype(x_ref.dtype)
    valid = (t_idx[:, :1] < total).astype(x_ref.dtype)  # (T_tile, 1)
    onehot = onehot * valid

    # f32 accumulate always (Mosaic requires a 32-bit acc); HIGHEST for f32
    # inputs — the MXU's default bf16 passes would round the copied rows,
    # and this is a selection matmul whose output must equal the input
    # bitwise. bf16 inputs are exact in a single pass (value x 1.0).
    precision = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out_ref[0, :, :] = jnp.dot(
        onehot, x_ref[0, :, :], preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(out_ref.dtype)


def _grad_kernel(ends_ref, g_ref, dx_ref):
    """Backward: dx[p] = sum_t onehot[t,p] * g[t] accumulated over tiles."""
    b = pl.program_id(0)
    tt = pl.program_id(1)
    P = dx_ref.shape[1]
    T_tile = g_ref.shape[1]

    ends = ends_ref[b, :]
    t0 = tt * T_tile
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (T_tile, P), 0) + t0
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (T_tile, P), 1)
    idx = jnp.sum((ends[None, :] <= t_idx).astype(jnp.int32), axis=1,
                  keepdims=True)
    idx = jnp.minimum(idx, P - 1)
    total = ends[P - 1]
    onehot = (p_idx == idx).astype(g_ref.dtype)
    onehot = onehot * (t_idx[:, :1] < total).astype(g_ref.dtype)

    precision = (jax.lax.Precision.HIGHEST if g_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    contrib = jnp.dot(onehot.T, g_ref[0, :, :],
                      preferred_element_type=jnp.float32,
                      precision=precision).astype(dx_ref.dtype)

    @pl.when(tt == 0)
    def _():
        dx_ref[0, :, :] = contrib

    @pl.when(tt > 0)
    def _():
        dx_ref[0, :, :] = dx_ref[0, :, :] + contrib


def _forward(x, ends, max_frames, t_tile, interpret):
    B, P, H = x.shape
    grid = (B, max_frames // t_tile)
    return pl.pallas_call(
        _expand_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, P), lambda b, t: (0, 0)),
            pl.BlockSpec((1, P, H), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_tile, H), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, max_frames, H), x.dtype),
        interpret=interpret,
    )(ends, x)


def _backward(g, ends, P, t_tile, interpret):
    B, T, H = g.shape
    grid = (B, T // t_tile)
    return pl.pallas_call(
        _grad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, P), lambda b, t: (0, 0)),
            pl.BlockSpec((1, t_tile, H), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, P, H), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, H), g.dtype),
        interpret=interpret,
    )(ends, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _regulate_core(x, ends, max_frames, t_tile, interpret):
    return _forward(x, ends, max_frames, t_tile, interpret)


def _regulate_fwd(x, ends, max_frames, t_tile, interpret):
    return _forward(x, ends, max_frames, t_tile, interpret), (ends, x.shape[1])


def _regulate_bwd(max_frames, t_tile, interpret, res, g):
    ends, P = res
    return _backward(g, ends, P, t_tile, interpret), None


_regulate_core.defvjp(_regulate_fwd, _regulate_bwd)


def regulate_pallas(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
    t_tile: int = T_TILE,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.length_regulator.regulate (same
    semantics, same mask). max_frames must be a multiple of t_tile."""
    assert max_frames % t_tile == 0, (max_frames, t_tile)
    durations = jnp.maximum(durations, 0).astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=-1)
    frames = _regulate_core(x, ends, max_frames, t_tile, interpret)
    total = ends[:, -1]
    mask = jnp.arange(max_frames)[None, :] < jnp.minimum(total, max_frames)[:, None]
    return frames, mask
