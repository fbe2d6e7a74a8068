"""Depthwise / grouped 1-D convolutions as shift-multiply ops.

XLA's native grouped-convolution lowering (``feature_group_count``) is
pathologically slow to compile on this TPU backend (>300 s for a single
256-channel depthwise conv). A depthwise conv is just k shifted
elementwise multiply-adds — pure VPU work that XLA fuses into one loop —
and a grouped conv with G groups of size ci is a small per-group einsum.
Both compile in milliseconds and run bandwidth-bound (speed-of-light for
this op).

Weight layouts:
- depthwise: ``w`` (k, C), ``b`` (C,) — torch Conv1d(C,C,k,groups=C) weight
  (C,1,k) transposed.
- grouped:   ``w`` (k, G, ci, co), ``b`` (G*co,) — torch
  Conv1d(G*ci, G*co, k, groups=G) weight (G*co, ci, k) reshaped.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _same_pad(T: int, k: int):
    # torch padding="same" for stride 1: left (k-1)//2, right k//2
    return (k - 1) // 2, k // 2


def depthwise_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    dilation: int = 1,
) -> jnp.ndarray:
    """x (B, T, C), w (k, C) -> (B, T, C), SAME padding (torch
    padding=(k*d-d)//2, exact for odd k)."""
    B, T, C = x.shape
    k = w.shape[0]
    keff = k * dilation - dilation + 1
    lpad, rpad = _same_pad(T, keff)
    xp = jnp.pad(x, ((0, 0), (lpad, rpad), (0, 0)))
    out = jnp.zeros_like(x)
    for j in range(k):
        off = j * dilation
        out = out + xp[:, off : off + T, :] * w[j][None, None, :]
    if b is not None:
        out = out + b[None, None, :]
    return out


def grouped_conv1d(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """x (B, T, G*ci), w (k, G, ci, co) -> (B, T, G*co), SAME padding."""
    B, T, Cin = x.shape
    k, G, ci, co = w.shape
    assert Cin == G * ci, f"{Cin} != {G}*{ci}"
    lpad, rpad = _same_pad(T, k)
    xg = x.reshape(B, T, G, ci)
    xp = jnp.pad(xg, ((0, 0), (lpad, rpad), (0, 0), (0, 0)))
    out = None
    for j in range(k):
        contrib = jnp.einsum("btgi,gio->btgo", xp[:, j : j + T], w[j])
        out = contrib if out is None else out + contrib
    out = out.reshape(B, T, G * co)
    if b is not None:
        out = out + b[None, None, :]
    return out


class DepthwiseConv1d(nn.Module):
    """Flax wrapper with torch-compatible init (kaiming-uniform fan_in)."""

    features: int  # == input channels
    kernel_size: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = self.features
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, 1, C),  # fan_in = kernel_size * 1
        ).reshape(self.kernel_size, C)
        b = (
            self.param(
                "bias",
                nn.initializers.uniform(scale=(1 / self.kernel_size) ** 0.5),
                (C,),
            )
            if self.use_bias
            else None
        )
        return depthwise_conv1d(
            x.astype(self.dtype), w.astype(self.dtype),
            b.astype(self.dtype) if b is not None else None,
        )


class GroupedConv1d(nn.Module):
    """Grouped conv, groups g, torch-layout-compatible params."""

    features: int  # output channels (G * co)
    groups: int
    kernel_size: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        G = self.groups
        ci = x.shape[-1] // G
        co = self.features // G
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (self.kernel_size, G, ci, co),
        )
        b = (
            self.param(
                "bias",
                nn.initializers.uniform(scale=(1 / (ci * self.kernel_size)) ** 0.5),
                (self.features,),
            )
            if self.use_bias
            else None
        )
        return grouped_conv1d(
            x.astype(self.dtype), w.astype(self.dtype),
            b.astype(self.dtype) if b is not None else None,
        )
