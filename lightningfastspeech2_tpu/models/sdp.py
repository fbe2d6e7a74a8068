"""Stochastic (flow-based) duration predictor, VITS-style.

Re-design of the reference's Coqui-derived SDP
(reference ``litfass/third_party/stochastic_duration_predictor/sdp.py``):
text-conditioned encoder (1x1 conv + dilated depthwise-separable conv
stack), a posterior encoder over durations providing variational
dequantization (z_u) and augmentation (z_v), ElementwiseAffine + N ConvFlow
rational-quadratic-spline coupling layers. Training returns the per-item
NLL; inference runs the flows in reverse from scaled noise and emits
log-durations.

Layout is channel-last (B, T, C) throughout (the reference is (B, C, T));
masks are True = valid. Channel flips between flows
(``torch.flip(z, [1])``) become ``z[..., ::-1]`` on the last axis.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightningfastspeech2_tpu.ops.depthwise import depthwise_conv1d
from lightningfastspeech2_tpu.ops.splines import (
    piecewise_rational_quadratic_transform,
)


class DilatedDepthSeparableConv(nn.Module):
    """num_layers x [depthwise(k, dil=k^i) -> LN -> GELU -> 1x1 -> LN ->
    GELU -> dropout] with residual (sdp.py:11-73)."""

    channels: int
    kernel_size: int
    num_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, g=None, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        if g is not None:
            x = x + g
        for i in range(self.num_layers):
            dilation = self.kernel_size**i
            w = self.param(
                f"sep{i}_kernel",
                nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                (self.kernel_size, 1, self.channels),
            ).reshape(self.kernel_size, self.channels)
            b = self.param(f"sep{i}_bias", nn.initializers.zeros, (self.channels,))
            y = depthwise_conv1d(x * m, w.astype(x.dtype), b.astype(x.dtype),
                                 dilation=dilation)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.channels, dtype=self.dtype, name=f"conv1x1_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = x + y
        return x * m


class ElementwiseAffine(nn.Module):
    """y = x*exp(s) + t with logdet = sum(s * mask) (sdp.py:76-97)."""

    channels: int

    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        t = self.param("translation", nn.initializers.zeros, (self.channels,))
        s = self.param("log_scale", nn.initializers.zeros, (self.channels,))
        m = mask[..., None].astype(x.dtype)
        if not reverse:
            y = (x * jnp.exp(s) + t) * m
            logdet = jnp.sum(s * m, axis=(1, 2))
            return y, logdet
        return (x - t) * jnp.exp(-s) * m


class ConvFlow(nn.Module):
    """Half-split coupling with a rational-quadratic spline on the second
    half, parameterized by a DDS conv over the first (sdp.py:100-169)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int
    num_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, g=None, reverse: bool = False,
                 deterministic: bool = True):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        m = mask[..., None].astype(x.dtype)

        h = nn.Dense(self.hidden_channels, dtype=self.dtype, name="pre")(x0)
        h = DilatedDepthSeparableConv(
            self.hidden_channels, self.kernel_size, self.num_layers,
            dtype=self.dtype, name="convs",
        )(h, mask, g=g, deterministic=deterministic)
        h = nn.Dense(
            half * (self.num_bins * 3 - 1), dtype=self.dtype, name="proj",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h) * m

        B, T = x.shape[:2]
        h = h.reshape(B, T, half, -1)  # (B,T,half,3K-1)
        scale = math.sqrt(self.hidden_channels)
        uw = h[..., : self.num_bins] / scale
        uh = h[..., self.num_bins : 2 * self.num_bins] / scale
        ud = h[..., 2 * self.num_bins :]

        # spline operates elementwise on x1 (B,T,half) with params (B,T,half,·)
        y1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound,
        )
        out = jnp.concatenate([x0, y1], axis=-1) * m
        logdet = jnp.sum(logabsdet * m, axis=(1, 2))
        if not reverse:
            return out, logdet
        return out


class StochasticDurationPredictor(nn.Module):
    """x (B,T,C), mask (B,T) True=valid; durations (B,T) at training.

    Training (reverse=False): returns per-item NLL (B,).
    Inference (reverse=True): returns log-durations (B,T).
    (sdp.py:172-349)
    """

    in_channels: int
    filter_size: int
    kernel_size: int
    dropout: float
    n_flows: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, durations=None, reverse: bool = False,
                 noise_scale: float = 1.0, deterministic: bool = True):
        m = mask[..., None].astype(jnp.float32)
        hc = self.filter_size

        x = nn.Dense(hc, dtype=self.dtype, name="pre")(x)
        x = DilatedDepthSeparableConv(
            hc, self.kernel_size, 3, self.dropout, self.dtype, name="convs"
        )(x, mask, deterministic=deterministic)
        x = nn.Dense(hc, dtype=self.dtype, name="proj")(x) * m
        x = x.astype(jnp.float32)

        flows = [ElementwiseAffine(2, name="flow_pre")] + [
            ConvFlow(2, hc, self.kernel_size, 3, dtype=self.dtype,
                     name=f"flow_{i}")
            for i in range(self.n_flows)
        ]

        if not reverse:
            assert durations is not None
            dr = durations[..., None].astype(jnp.float32)

            h = nn.Dense(hc, dtype=self.dtype, name="post_pre")(dr)
            h = DilatedDepthSeparableConv(
                hc, self.kernel_size, 3, self.dropout, self.dtype,
                name="post_convs",
            )(h, mask, deterministic=deterministic)
            h = nn.Dense(hc, dtype=self.dtype, name="post_proj")(h) * m
            h = h.astype(jnp.float32)

            post_flows = [ElementwiseAffine(2, name="post_flow_pre")] + [
                ConvFlow(2, hc, self.kernel_size, 3, dtype=self.dtype,
                         name=f"post_flow_{i}")
                for i in range(self.n_flows)
            ]

            noise = (
                jax.random.normal(self.make_rng("sdp"), (dr.shape[0], dr.shape[1], 2))
                * m
            )
            z_q = noise
            logdet_tot_q = 0.0
            for idx, flow in enumerate(post_flows):
                z_q, logdet_q = flow(z_q, mask, g=(x + h),
                                     deterministic=deterministic)
                logdet_tot_q = logdet_tot_q + logdet_q
                if idx > 0:
                    z_q = z_q[..., ::-1]

            z_u, z_v = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * m
            z0 = (dr - u) * m
            logdet_tot_q = logdet_tot_q + jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * m,
                axis=(1, 2),
            )
            nll_posterior = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + noise**2) * m, axis=(1, 2))
                - logdet_tot_q
            )

            z0 = jnp.log(jnp.maximum(z0, 1e-5)) * m
            logdet_tot = jnp.sum(-z0, axis=(1, 2))
            z = jnp.concatenate([z0, z_v], axis=-1)
            for idx, flow in enumerate(flows):
                z, logdet = flow(z, mask, g=x, deterministic=deterministic)
                logdet_tot = logdet_tot + logdet
                if idx > 0:
                    z = z[..., ::-1]
            nll_flows = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * m, axis=(1, 2))
                - logdet_tot
            )
            return nll_flows + nll_posterior

        # ----------------------------------------------------- inference
        rev = list(reversed(flows))
        rev = rev[:-2] + [rev[-1]]  # drop the unused extra flow (sdp.py:338)
        z = (
            jax.random.normal(self.make_rng("sdp"), (x.shape[0], x.shape[1], 2))
            * noise_scale
        )
        for flow in rev:
            z = z[..., ::-1]
            z = flow(z, mask, g=x, reverse=True, deterministic=deterministic)
        return z[..., 0]
