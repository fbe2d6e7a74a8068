"""Pallas TPU soft-DTW: the full dynamic program in VMEM.

The reference computes soft-DTW with numba CPU loops (eval metric,
reference ``litfass/third_party/softdtw/__init__.py:7-51``) and the pysdtw
CUDA kernel (training loss, ``loss.py:5,36``), both of which walk the
(N, M) lattice one anti-diagonal at a time. The pure-JAX wavefront in
``ops/soft_dtw.py`` expresses that as a ``lax.scan``; this kernel instead
runs the *entire* recurrence inside one Mosaic program, with the distance
matrix, the R lattice, and every diagonal staying in VMEM — no per-step
HBM round-trips and no scan loop machinery.

Layout: the lattice is **skewed** so each anti-diagonal is one contiguous
vector register row: ``S[d, i] = A[i, d - i]`` for an (N, M) matrix A.
In skew coordinates the soft-DTW stencil becomes pure row shifts,

    R[d, i] = D[d, i] + softmin(R[d-1, i-1],   # up    (i-1, j)
                                R[d-1, i],     # left  (i, j-1)
                                R[d-2, i-1])   # diag  (i-1, j-1)

so a diagonal update is two row loads, one lane shift, a softmin, and a
row store — all VPU work on (1, N) vectors.

The backward pass is the standard E-recurrence (Cuturi & Blondel 2017)
run in reverse skew order inside a second kernel (dE/dD = E), wired up
with ``jax.custom_vjp``; the forward kernel emits the full skewed R
lattice (N+M-1 rows x N lanes, f32 — ~0.5 MB at the 256-frame training
chunk size) for the backward to consume.

Like the reference implementations this is exact soft-DTW, not an
approximation: values and gradients match the lax.scan path bit-for-bit
up to f32 reassociation (tests/test_pallas_soft_dtw.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = 1e10  # matches ops/soft_dtw.py


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def skew(a: jnp.ndarray, n_pad: int, fill: float) -> jnp.ndarray:
    """(N, M) -> (N+M-1, n_pad) with S[d, i] = A[i, d-i]; out-of-lattice
    cells (and lane padding) take ``fill``."""
    N, M = a.shape
    ndiag = N + M - 1
    d = jnp.arange(ndiag)[:, None]
    i = jnp.arange(n_pad)[None, :]
    j = d - i
    valid = (i < N) & (j >= 0) & (j < M)
    return jnp.where(
        valid, a[jnp.clip(i, 0, N - 1), jnp.clip(j, 0, M - 1)], fill
    )


def unskew(s: jnp.ndarray, N: int, M: int) -> jnp.ndarray:
    """Inverse of :func:`skew` (drops padding)."""
    i = jnp.arange(N)[:, None]
    j = jnp.arange(M)[None, :]
    return s[i + j, i]


def _shift_lanes_right(v: jnp.ndarray, fill: float) -> jnp.ndarray:
    """(1, L) -> value at lane l becomes v[l-1]; lane 0 takes ``fill``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == 0, fill, jnp.roll(v, 1, axis=1))


def _shift_lanes_left(v: jnp.ndarray, fill: float) -> jnp.ndarray:
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == v.shape[1] - 1, fill, jnp.roll(v, -1, axis=1))


def _fwd_kernel(d_ref, r_ref, *, N, M, gamma):
    ndiag = N + M - 1
    n_pad = d_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    # d = 0: R[0,0] = D[0,0]
    row0 = d_ref[pl.ds(0, 1), :]
    r_ref[pl.ds(0, 1), :] = jnp.where(lane == 0, row0, _INF)

    def body(d, _):
        dvals = d_ref[pl.ds(d, 1), :]
        r1 = r_ref[pl.ds(d - 1, 1), :]
        r2_row = jnp.maximum(d - 2, 0)
        r2 = jnp.where(d >= 2, r_ref[pl.ds(r2_row, 1), :], _INF)
        up = _shift_lanes_right(r1, _INF)
        left = r1
        diag = _shift_lanes_right(r2, _INF)
        m = jnp.minimum(jnp.minimum(up, left), diag)
        soft = m - gamma * jnp.log(
            jnp.exp((m - up) / gamma)
            + jnp.exp((m - left) / gamma)
            + jnp.exp((m - diag) / gamma)
        )
        col = d - lane
        valid = (col >= 0) & (col < M) & (lane < N)
        r_ref[pl.ds(d, 1), :] = jnp.where(valid, dvals + soft, _INF)
        return 0

    jax.lax.fori_loop(1, ndiag, body, 0)


def _bwd_kernel(d_ref, r_ref, e_ref, *, N, M, gamma):
    ndiag = N + M - 1
    n_pad = d_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    # seed: E at (N-1, M-1) (skew row ndiag-1, lane N-1)
    e_ref[pl.ds(ndiag - 1, 1), :] = jnp.where(
        lane == N - 1, 1.0, 0.0
    ).astype(e_ref.dtype)

    def body(k, _):
        d = ndiag - 2 - k
        r0 = r_ref[pl.ds(d, 1), :]
        nxt = jnp.minimum(d + 1, ndiag - 1)
        nxt2 = jnp.minimum(d + 2, ndiag - 1)
        r1 = r_ref[pl.ds(nxt, 1), :]
        d1 = d_ref[pl.ds(nxt, 1), :]
        e1 = e_ref[pl.ds(nxt, 1), :]
        have2 = d + 2 <= ndiag - 1
        r2 = jnp.where(have2, r_ref[pl.ds(nxt2, 1), :], _INF)
        d2 = jnp.where(have2, d_ref[pl.ds(nxt2, 1), :], _INF)
        e2 = jnp.where(have2, e_ref[pl.ds(nxt2, 1), :], 0.0)

        col = d - lane
        valid = (col >= 0) & (col < M) & (lane < N)

        # (i+1, j): skew (d+1, i+1) -> shift row d+1 left
        ra = _shift_lanes_left(r1, _INF)
        da = _shift_lanes_left(d1, _INF)
        ea = _shift_lanes_left(e1, 0.0)
        va = (lane + 1 < N) & (col >= 0) & (col < M)
        # (i, j+1): skew (d+1, i)
        vb = (lane < N) & (col + 1 >= 0) & (col + 1 < M)
        # (i+1, j+1): skew (d+2, i+1)
        rc = _shift_lanes_left(r2, _INF)
        dc = _shift_lanes_left(d2, _INF)
        ec = _shift_lanes_left(e2, 0.0)
        vc = (lane + 1 < N) & (col + 1 >= 0) & (col + 1 < M)

        def w(rn, dn, vn):
            arg = jnp.clip((rn - r0 - dn) / gamma, -80.0, 30.0)
            return jnp.where(vn & valid, jnp.exp(arg), 0.0)

        e = ea * w(ra, da, va) + e1 * w(r1, d1, vb) + ec * w(rc, dc, vc)
        # the loop never revisits the seeded terminal diagonal (d stops at
        # ndiag-2), so a plain validity mask suffices
        e_ref[pl.ds(d, 1), :] = jnp.where(valid, e, 0.0).astype(e_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ndiag - 1, body, 0)


def _run_fwd(D: jnp.ndarray, gamma: float, interpret: bool):
    N, M = D.shape
    ndiag = N + M - 1
    n_pad = max(_pad_up(N, 128), 128)
    nd_pad = max(_pad_up(ndiag, 8), 8)
    Ds = skew(D.astype(jnp.float32), n_pad, _INF)
    Ds = jnp.pad(Ds, ((0, nd_pad - ndiag), (0, 0)), constant_values=_INF)
    r = pl.pallas_call(
        functools.partial(_fwd_kernel, N=N, M=M, gamma=float(gamma)),
        out_shape=jax.ShapeDtypeStruct((nd_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(Ds)
    # the soft-DTW value lives at lattice corner (N-1, M-1); scalar reads
    # happen in XLA, not the kernel (Mosaic can't store scalars to VMEM)
    return r[ndiag - 1, N - 1], (Ds, r)


def _run_bwd(Ds: jnp.ndarray, r: jnp.ndarray, N: int, M: int, gamma: float,
             interpret: bool):
    e = pl.pallas_call(
        functools.partial(_bwd_kernel, N=N, M=M, gamma=float(gamma)),
        out_shape=jax.ShapeDtypeStruct(r.shape, jnp.float32),
        interpret=interpret,
    )(Ds, r)
    return unskew(e, N, M)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def soft_dtw_from_dist_pallas(
    D: jnp.ndarray, gamma: float = 1.0, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for ``ops.soft_dtw.soft_dtw_from_dist`` backed by the
    wavefront kernels."""
    val, _ = _run_fwd(D, gamma, interpret)
    return val


def _vjp_fwd(D, gamma, interpret):
    val, (Ds, r) = _run_fwd(D, gamma, interpret)
    return val, (Ds, r, D.shape)


def _vjp_bwd(gamma, interpret, res, g):
    Ds, r, (N, M) = res
    E = _run_bwd(Ds, r, N, M, gamma, interpret)
    return (E * g,)


soft_dtw_from_dist_pallas.defvjp(_vjp_fwd, _vjp_bwd)
