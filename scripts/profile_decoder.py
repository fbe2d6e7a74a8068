#!/usr/bin/env python
"""Attribute the flagship forward's decoder time (the headline bottleneck).

bench.py round 2: device fwd = 9.0 ms at B=8, P=256, T=2048, of which the
round-1 component probe put ~6 ms in the decoder FFTStack. Decoder forward
FLOPs at these shapes are only ~210 GFLOP (~1.1 ms at v5e bf16 peak), so
~18% MFU — this script times each decoder sub-part as its own on-chip
lax.scan program (the tunnel-free methodology of profile_flash_fwd.py) to
find where the other ~5 ms go.

Usage: python scripts/profile_decoder.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core.compile_cache import (
    enable_fast_prng,
    enable_persistent_cache,
)

enable_persistent_cache()
enable_fast_prng()

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.models import layers

B, T, H = 8, 2048, 256
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
DTYPE = jnp.bfloat16

cfg = C.lightspeech_flagship()
dec_cfg = cfg.model.decoder

rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, T, H), DTYPE)
mask = jnp.ones((B, T), bool)


def time_module(label, module, *args, needs_mask=False, det=True):
    """Time module.apply as one on-chip scan program; carry perturbs the
    input so steps serialize without being foldable."""
    init_args = (x, mask) if needs_mask else (x,)
    params = module.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        *init_args,
    )

    @jax.jit
    def scan(params, x):
        def body(c, _):
            xi = x + c * 1e-30
            a = (xi, mask, det) if needs_mask else (xi, det)
            out = module.apply(params, *a)
            return out[0, 0, 0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c

    float(scan(params, x))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan(params, x))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label:44s} {best * 1e3:8.3f} ms")
    return best


# ---- whole decoder stack, flash off/on ---------------------------------
stack = layers.FFTStack(dec_cfg, dtype=DTYPE)
_orig = layers._flash_ok
layers._flash_ok = lambda T, d, det: False
t_stack_off = time_module("decoder FFTStack x4 (flash OFF)", stack,
                          needs_mask=True)
layers._flash_ok = lambda T, d, det: True
t_stack_on = time_module("decoder FFTStack x4 (flash ON)", stack,
                         needs_mask=True)
layers._flash_ok = _orig

# ---- attention alone ----------------------------------------------------
import flax.linen as nn


class AttnOnly(nn.Module):
    n: int = 4

    @nn.compact
    def __call__(self, x, mask, det=True):
        for i in range(self.n):
            x = layers.SelfAttention(H, dec_cfg.heads, 0.1, DTYPE,
                                     name=f"a{i}")(x, mask, det)
        return x


layers._flash_ok = lambda T, d, det: False
t_attn_off = time_module("SelfAttention x4 (flash OFF)", AttnOnly(),
                         needs_mask=True)
layers._flash_ok = lambda T, d, det: True
t_attn_on = time_module("SelfAttention x4 (flash ON)", AttnOnly(),
                        needs_mask=True)
layers._flash_ok = _orig


# ---- conv FFN alone (per-layer kernel sizes) ----------------------------
class FFNOnly(nn.Module):
    @nn.compact
    def __call__(self, x, det=True):
        for i, k in enumerate(dec_cfg.kernel_sizes):
            x = layers.ConvFFN(H, dec_cfg.conv_filter_size, k, 1,
                               dec_cfg.depthwise, 0.1, DTYPE,
                               name=f"f{i}")(x, det)
        return x


t_ffn = time_module("ConvFFN x4 (depthwise-separable)", FFNOnly())


# ---- layernorms alone ----------------------------------------------------
class LNOnly(nn.Module):
    @nn.compact
    def __call__(self, x, det=True):
        for i in range(8):
            x = nn.LayerNorm(epsilon=1e-5, dtype=DTYPE, name=f"n{i}")(x)
        return x


t_ln = time_module("LayerNorm x8", LNOnly())


# ---- FFN internals bisect ------------------------------------------------
class DepthOnly(nn.Module):
    @nn.compact
    def __call__(self, x, det=True):
        for i, k in enumerate(dec_cfg.kernel_sizes):
            x = layers.DepthwiseConv1d(H, k, dtype=DTYPE, name=f"d{i}")(x)
        return x


class PointOnly(nn.Module):
    """The two pointwise matmuls (256->1024, grouped, 1024->256) per layer."""

    @nn.compact
    def __call__(self, x, det=True):
        for i in range(4):
            h = nn.Dense(dec_cfg.conv_filter_size, dtype=DTYPE,
                         name=f"up{i}")(x)
            h = nn.relu(h)
            x = nn.Dense(H, dtype=DTYPE, name=f"down{i}")(h)
        return x


t_dw = time_module("DepthwiseConv1d x4 (k=17,21,9,13)", DepthOnly())
t_pw = time_module("pointwise 256->1024->256 x4", PointOnly())

print()
print(f"parts sum (attn+ffn+ln):        {(t_attn_off + t_ffn + t_ln)*1e3:8.3f} ms")
print(f"whole stack (flash off):        {t_stack_off*1e3:8.3f} ms")
print(f"attention flash on/off delta:   {(t_attn_off - t_attn_on)*1e3:8.3f} ms")
