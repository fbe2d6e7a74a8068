"""Transformer/FFT-block building blocks (flax.linen).

TPU-native re-design of the reference's conformer-style encoder layers
(reference ``litfass/fastspeech2/model.py:38-122``): a torch
TransformerEncoderLayer with the linear FFN swapped for two 1-D conv stacks
(optionally depthwise-separable, the LightSpeech trick that keeps the 76M
model from being ~1B — reference README.md:10). Post-norm residual order
matches torch's default (norm_first=False).

All sequence masks in this codebase are True = VALID (the reference uses
True = padding; inverted once at the boundary).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightningfastspeech2_tpu.core.config import StackConfig
from lightningfastspeech2_tpu.ops.depthwise import (
    DepthwiseConv1d,
    GroupedConv1d,
    depthwise_conv1d,
    grouped_conv1d,
)


def _flash_ok(T: int, head_dim: int, deterministic: bool) -> bool:
    """Static decision whether the fused attention kernel applies: backend
    supports Mosaic, sequence tiles into 128-row programs, and the head dim
    fills the 128-lane MXU registers.

    Measured on v5e at the flagship shapes (B=8, T=2048, d=128): the
    kernel cuts the TRAIN step 13% (the backward avoids the (B,h,T,T)
    HBM round-trips), but the deterministic forward gains nothing — a
    tunnel-free re-measurement (scripts/profile_flash_fwd.py, single
    on-chip lax.scan per variant) puts flash-on at 9.013 ms/fwd vs
    8.999 ms flash-off, i.e. a wash within 0.2%: XLA's
    fused einsum+softmax already hides the scores' HBM traffic behind
    the conv FFN at these shapes, and the kernel's q/kT layout
    transposes eat the savings. Short sequences (encoder, T=256) lose
    outright to the fused softmax. So: training mode, long sequences
    only."""
    if deterministic or T < 1024 or T % 128 != 0 or head_dim % 128 != 0:
        return False
    from lightningfastspeech2_tpu.ops.kernel_gate import pallas_enabled

    return pallas_enabled()


def _fused_ffn_ok(hidden: int, filter_size: int,
                  train: bool = False) -> bool:
    """Static gate for the fused FFN-half kernel (ops/pallas_ffn.py):
    backend supports Mosaic and the matmul dims fill 128-lane registers
    (interpret mode — CPU tests — accepts any dims). Opt-out via
    ``LFS2_FUSED_FFN=0``.

    Like every LFS2_* kernel flag this is read at TRACE time and jit
    caches don't key on env vars: set it before the first trace, or
    rebuild the jitted closure after flipping it (see
    ops/kernel_gate.py module docstring)."""
    import os

    if os.environ.get("LFS2_FUSED_FFN", "1").lower() in ("0", "false", "off"):
        return False
    from lightningfastspeech2_tpu.ops.kernel_gate import (
        pallas_enabled,
        pallas_interpret,
    )

    if not pallas_enabled():
        return False
    if pallas_interpret():
        return True
    if hidden % 128 != 0 or filter_size % 128 != 0:
        return False
    if not train:
        # deterministic fwd (fused_ffn_ln): empirically green on v5e up
        # to the true-76M dims (640, 2560) — the resident set is one
        # (tile+2*halo, F) f32 intermediate + the two bf16 weights
        return True
    # VMEM fit estimate for the TRAIN backward (ops/pallas_ffn.py
    # _ffn_train_bwd_kernel), the tightest resident set: both layouts of
    # both pointwise weights (bf16) + f32 dw1/dw2 partials, all (C, F) —
    # 16*C*F bytes — plus ~3 (tile+2D, F) f32 intermediates at the bwd
    # tile of 256. At the flagship (256, 1024) this is ~7.7 MB; at the
    # true-76M dims (640, 2560) it is ~29 MB and the Mosaic compile
    # aborts the TPU compile helper outright (round-5 finding: the
    # round-4 true76m train row could never have compiled) — gate the
    # train path to XLA instead of crashing.
    fixed = 16 * hidden * filter_size
    per_tile = 3 * (256 + 64) * filter_size * 4
    return fixed + per_tile <= 14 * 1024 * 1024


def layer_norm_fn(x, scale, bias, dtype, eps: float = 1e-5):
    """Functional LayerNorm with flax ``nn.LayerNorm`` numerics exactly:
    f32 fast-variance stats, ``(x - mean) * (rsqrt(var+eps) * scale) +
    bias`` in f32, cast to ``dtype``. Used so FFTBlock can own the norm
    *parameters* (declared via ``_LayerNormParams``) while the compute
    routes through either this or the fused Pallas kernel."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = xf - mean
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = y * mul + bias.astype(jnp.float32)
    return y.astype(dtype)


class _LayerNormParams(nn.Module):
    """Param holder matching ``nn.LayerNorm``'s tree exactly
    (scale ones, bias zeros at the same path)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DepthwiseParams(nn.Module):
    """Param holder matching ops.depthwise.DepthwiseConv1d's tree."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, 1, self.features),
        ).reshape(self.kernel_size, self.features)
        b = self.param(
            "bias",
            nn.initializers.uniform(scale=(1 / self.kernel_size) ** 0.5),
            (self.features,),
        )
        return w, b


class _PointConvParams(nn.Module):
    """Param holder matching ``nn.Conv(features, (1,))``'s tree
    (kernel (1, in, out) lecun_normal, bias zeros)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


class _GroupedParams(nn.Module):
    """Param holder matching ops.depthwise.GroupedConv1d's tree."""

    features: int
    groups: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        ci = self.in_features // self.groups
        co = self.features // self.groups
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, self.groups, ci, co),
        )
        b = self.param(
            "bias",
            nn.initializers.uniform(scale=(1 / (ci * self.kernel_size)) ** 0.5),
            (self.features,),
        )
        return w, b


class PositionalEncoding(nn.Module):
    """Classic sinusoidal additive positional encoding + dropout
    (reference ``model.py:38-55``), precomputed as a constant."""

    d_model: int
    max_len: int = 5000
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        T = x.shape[1]
        position = jnp.arange(self.max_len)[:, None].astype(jnp.float32)
        div_term = jnp.exp(
            jnp.arange(0, self.d_model, 2).astype(jnp.float32)
            * (-math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((self.max_len, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        x = x + pe[None, :T, :].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class SelfAttention(nn.Module):
    """Multi-head self-attention, same math as torch nn.MultiheadAttention:
    packed QKV projections, scaled dot product, key-padding mask, output
    projection."""

    hidden: int
    heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,  # (B, T) True = valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, T, H = x.shape
        head_dim = self.hidden // self.heads
        qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(a):
            return a.reshape(B, T, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        if _flash_ok(T, head_dim, deterministic):
            # fused Pallas kernel: scores never round-trip to HBM
            # (ops/pallas_attention.py); attention-prob dropout runs inside
            # the kernel off the TPU PRNG — same statistics, different
            # stream than nn.Dropout
            from lightningfastspeech2_tpu.ops.kernel_gate import (
                pallas_interpret,
            )
            from lightningfastspeech2_tpu.ops.pallas_attention import (
                flash_attention,
            )

            rate = 0.0 if deterministic else self.dropout
            seed = (
                jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max
                )
                if rate > 0.0
                else 0
            )
            out = flash_attention(
                q, k, v, mask, dropout_rate=rate, seed=seed,
                interpret=pallas_interpret(),
            ).astype(q.dtype)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
            if mask is not None:
                neg = jnp.finfo(scores.dtype).min
                scores = jnp.where(mask[:, None, None, :], scores, neg)
            probs = nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.hidden)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out")(out)


class ConvFFN(nn.Module):
    """The conformer feed-forward: conv1 -> ReLU -> dropout -> conv2 ->
    dropout (reference ``model.py:73-106,118-122``).

    Depthwise mode mirrors the reference exactly, including its quirk that
    conv2's grouped conv uses ``groups=conv_in`` over ``filter_size``
    channels (group size filter/hidden, ``model.py:84-93``).
    """

    hidden: int
    filter_size: int
    kernel1: int
    kernel2: int
    depthwise: bool
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        deterministic: bool = True,
        params_only: bool = False,
    ):
        # grouped/depthwise convs use the shift-multiply formulation from
        # ops/depthwise.py — XLA's feature_group_count lowering takes >300 s
        # to compile on TPU for these shapes
        conv = lambda feat, k, name: nn.Conv(
            features=feat,
            kernel_size=(k,),
            padding="SAME",
            dtype=self.dtype,
            name=name,
        )
        if self.depthwise:
            # params are declared through holder modules (identical tree to
            # the former DepthwiseConv1d/nn.Conv/GroupedConv1d submodules)
            # so FFTBlock's fused Pallas path can consume the raw arrays
            wd, bd = _DepthwiseParams(self.hidden, self.kernel1,
                                      name="conv1_depth")()
            w1, b1 = _PointConvParams(self.hidden, self.filter_size,
                                      name="conv1_point")()
            wg, bg = _GroupedParams(self.filter_size, self.hidden,
                                    self.kernel2, self.filter_size,
                                    name="conv2_group")()
            w2, b2 = _PointConvParams(self.filter_size, self.hidden,
                                      name="conv2_point")()
            if params_only:
                return (wd, bd, w1, b1, wg, bg, w2, b2)
            dt = self.dtype
            h = depthwise_conv1d(x.astype(dt), wd.astype(dt), bd.astype(dt))
            h = h @ w1[0].astype(dt) + b1.astype(dt)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = grouped_conv1d(h, wg.astype(dt), bg.astype(dt))
            h = h @ w2[0].astype(dt) + b2.astype(dt)
        else:
            assert not params_only, "fused path requires depthwise mode"
            h = conv(self.filter_size, self.kernel1, "conv1")(x)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = conv(self.hidden, self.kernel2, "conv2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class LinearFFN(nn.Module):
    """Vanilla transformer FFN fallback (non-conformer path,
    reference ``fastspeech2.py:288-295``)."""

    hidden: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class FFTBlock(nn.Module):
    """One encoder layer: post-norm MHA + conv-FFN residual blocks
    (reference ``model.py:108-122``)."""

    hidden: int
    heads: int
    kernel1: int
    kernel2: int
    filter_size: int
    depthwise: bool
    conformer: bool = True
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        additional_src: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # re-injected embedding at every layer: the reference *intended*
        # this (fastspeech2.py:679-683) but its layers never accepted the
        # argument; implemented properly here (SURVEY.md "defects to not
        # replicate").
        if additional_src is not None:
            x = x + additional_src
        sa = SelfAttention(self.hidden, self.heads, self.dropout, self.dtype)(
            x, mask, deterministic
        )
        sa = nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        # norm params are owned here (same tree as the former nn.LayerNorm
        # submodules) so the whole FFN half — LN1 -> ConvFFN -> residual ->
        # LN2 — can run as ONE Pallas kernel (ops/pallas_ffn.py):
        # deterministic forwards via fused_ffn_ln, training via
        # fused_ffn_ln_train (in-kernel dropout + recompute-based VJP)
        g1, be1 = _LayerNormParams(self.hidden, name="norm1")()
        g2, be2 = _LayerNormParams(self.hidden, name="norm2")()
        if self.conformer:
            ffn = ConvFFN(
                self.hidden,
                self.filter_size,
                self.kernel1,
                self.kernel2,
                self.depthwise,
                self.dropout,
                self.dtype,
            )
            if (
                self.depthwise
                and self.kernel2 == 1
                and _fused_ffn_ok(self.hidden, self.filter_size,
                                  train=not deterministic)
            ):
                from lightningfastspeech2_tpu.ops.kernel_gate import (
                    pallas_interpret,
                )
                from lightningfastspeech2_tpu.ops.pallas_ffn import (
                    fused_ffn_ln,
                    fused_ffn_ln_train,
                )

                p = ffn(None, deterministic, params_only=True)
                if deterministic:
                    return fused_ffn_ln(
                        x + sa, *p, g1, be1, g2, be2,
                        interpret=pallas_interpret(),
                    )
                # training: same fusion + in-kernel dropout + custom VJP
                # (ops/pallas_ffn.py fused_ffn_ln_train) — the (B, T, F)
                # intermediate never round-trips HBM in either pass;
                # position-hashed masks are a different stream than
                # nn.Dropout (like the flash kernel's PRNG), same stats
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max,
                )
                return fused_ffn_ln_train(
                    x + sa, *p, g1, be1, g2, be2, seed,
                    1e-5, self.dropout, 1024, pallas_interpret(),
                )
            x = layer_norm_fn(x + sa, g1, be1, self.dtype)
            ff = ffn(x, deterministic)
        else:
            x = layer_norm_fn(x + sa, g1, be1, self.dtype)
            ff = LinearFFN(
                self.hidden,
                self.dim_feedforward or self.filter_size,
                self.dropout,
                self.dtype,
            )(x, deterministic)
        return layer_norm_fn(x + ff, g2, be2, self.dtype)


class FFTStack(nn.Module):
    """Encoder/decoder stack of FFT blocks with per-layer kernel sizes.

    The reference builds layer i with ``conv_kernel=(kernel_sizes[i], 1)``
    (``fastspeech2.py:276-286``): conv1 uses the per-layer kernel, conv2 is
    always pointwise (kernel 1)."""

    cfg: StackConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        additional_src: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        kernels = c.kernel_sizes if c.conformer else (3,) * c.layers
        for i in range(c.layers):
            x = FFTBlock(
                hidden=c.hidden,
                heads=c.heads,
                kernel1=kernels[i],
                kernel2=1,
                filter_size=c.conv_filter_size,
                depthwise=c.depthwise,
                conformer=c.conformer,
                dim_feedforward=c.dim_feedforward,
                dropout=c.dropout,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, mask, deterministic, additional_src)
        return x
