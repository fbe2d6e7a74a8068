#!/usr/bin/env python
"""Minimal repro: the k-major dK/dV attention-backward kernel hangs the
TPU AOT compiler (negative result, round 5).

Round 4 landed an opt-in "split backward" for flash attention: a q-tiled
dQ pass plus a K-MAJOR dK/dV pass that writes each (Tk, d) tile once
from LSE-reconstructed probabilities (VERDICT r3 item 6's "(d,T)-layout
dK/dV" idea). It passed interpret-mode parity and TPU cross-lowering —
but on the real toolchain (libtpu via the axon AOT compile helper,
v5e:1x1x1) the backend compile of its dv contraction

    pT (Tk=256, T=2048) f32  @  do (T=2048, d=128)

never returns (>9 min, helper subprocess eventually killed/aborts with
exit code 1). This script is the ~40-line distillation: a single Pallas
kernel whose body is exactly that matmul chain. If a future libtpu
compiles it in seconds, the split-backward idea is worth re-landing
(see git history of ops/pallas_attention.py, round-4 commit dbbc4a8).

Expected on a healthy toolchain: prints "ok" in < 1 min.
Observed (2026-08-20, libtpu in this image): hangs, then
MosaicError INTERNAL ... tpu_compile_helper subprocess exit code 1.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, H, T, d, Tk = 2, 2, 2048, 128, 256


def kern(lse_ref, k_ref, qT_ref, do_ref, dv_ref):
    k = k_ref[0, 0]                                 # (Tk, d)
    sT = jax.lax.dot_general(                       # (Tk, T) keys-major
        k, qT_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pT = jnp.exp(sT - lse_ref[0, 0][0][None, :])
    do = do_ref[0, 0]                               # (T, d)
    dv = jax.lax.dot_general(                       # <- hangs the compiler
        pT.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def main():
    q = jnp.zeros((B, H, T, d), jnp.bfloat16)
    lse = jnp.zeros((B, H, 8, T), jnp.float32)
    kT = jnp.swapaxes(q, 2, 3)
    ktile = pl.BlockSpec((1, 1, Tk, d), lambda b, h, t: (b, h, t, 0))
    full_td = pl.BlockSpec((1, 1, T, d), lambda b, h, t: (b, h, 0, 0))
    full_dt = pl.BlockSpec((1, 1, d, T), lambda b, h, t: (b, h, 0, 0))
    full_row = pl.BlockSpec((1, 1, 8, T), lambda b, h, t: (b, h, 0, 0))
    f = pl.pallas_call(
        kern,
        grid=(B, H, T // Tk),
        in_specs=[full_row, ktile, full_dt, full_td],
        out_specs=ktile,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )
    out = jax.jit(lambda: f(lse, q, kT, q))()
    print("ok", float(out[0, 0, 0, 0]))


if __name__ == "__main__":
    main()
