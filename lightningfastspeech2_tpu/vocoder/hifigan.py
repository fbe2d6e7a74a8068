"""HiFi-GAN V1 generator in pure JAX/flax, torch-parity semantics.

Re-implementation of the reference's vocoder
(reference ``litfass/third_party/hifigan/models.py:112-174``, config
``litfass/third_party/hifigan/config.json``): conv_pre(7) -> 4x
[ConvTranspose1d upsample (rates 8,8,2,2; kernels 16,16,4,4) + mean of 3
multi-kernel ResBlocks (k=3,7,11, dilations 1/3/5)] -> leaky_relu ->
conv_post(7) -> tanh. Hop 256 = prod(rates): mel (B,T,80) -> wav (B,T*256).

torch-parity details this file owns:
- ConvTranspose1d via lax.conv_general_dilated with lhs_dilation (input
  dilation) and padding (k-1-p); kernel tap-reversed relative to Conv,
- dilated Conv1d padding (k*d - d)/2 ("same" for odd k),
- weight-norm folding for converted checkpoints:
  weight = g * v / ||v||_rows (torch weight_norm dim=0),
- leaky_relu slope 0.1.

Weight layouts are flax-native (k, in, out); ``convert_torch_state_dict``
maps a released torch checkpoint (with weight_g/weight_v pairs) into the
param pytree for the mel->waveform allclose goal (BASELINE.json).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HifiGanConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5)
    )
    num_mels: int = 80
    sampling_rate: int = 22050

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def conv1d(x, w, b, dilation: int = 1, padding: int = 0):
    """torch Conv1d semantics; x (B,T,C), w (k,in,out)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b[None, None, :] if b is not None else out


def conv_transpose1d(x, w, b, stride: int, padding: int):
    """torch ConvTranspose1d semantics via input dilation; x (B,T,C),
    w (k,in,out). out length = (T-1)*stride - 2*padding + k."""
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x, w[::-1],  # transpose conv correlates with the flipped kernel
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b[None, None, :] if b is not None else out


class TorchConv1d(nn.Module):
    features: int
    kernel_size: int
    dilation: int = 1
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.normal(0.01),
            (self.kernel_size, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv1d(
            x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype),
            self.dilation, self.padding,
        )


class TorchConvTranspose1d(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.normal(0.01),
            (self.kernel_size, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv_transpose1d(
            x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype),
            self.stride, self.padding,
        )


class ResBlock1(nn.Module):
    """3x [dilated conv + conv] residual pairs (models.py:20-93)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = TorchConv1d(
                self.channels, self.kernel_size, d,
                _get_padding(self.kernel_size, d), self.dtype,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = TorchConv1d(
                self.channels, self.kernel_size, 1,
                _get_padding(self.kernel_size, 1), self.dtype,
                name=f"convs2_{i}",
            )(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """2x single dilated conv residual (HiFi-GAN V2/V3 variant)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = TorchConv1d(
                self.channels, self.kernel_size, d,
                _get_padding(self.kernel_size, d), self.dtype,
                name=f"convs_{i}",
            )(xt)
            x = x + xt
        return x


class Generator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T*hop) in [-1, 1]
    (models.py:112-165)."""

    cfg: HifiGanConfig = HifiGanConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = TorchConv1d(
            c.upsample_initial_channel, 7, 1, 3, self.dtype, name="conv_pre"
        )(mel)
        res = ResBlock1 if c.resblock == "1" else ResBlock2
        n_kernels = len(c.resblock_kernel_sizes)
        for i, (rate, k_up) in enumerate(
            zip(c.upsample_rates, c.upsample_kernel_sizes)
        ):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = TorchConvTranspose1d(
                ch, k_up, rate, (k_up - rate) // 2, self.dtype, name=f"ups_{i}"
            )(x)
            acc = None
            for j, (k, ds) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                out = res(ch, k, tuple(ds), self.dtype,
                          name=f"resblocks_{i * n_kernels + j}")(x)
                acc = out if acc is None else acc + out
            x = acc / n_kernels
        # models.py:161 uses F.leaky_relu's DEFAULT slope (0.01) here,
        # unlike every other activation in the network
        x = nn.leaky_relu(x, 0.01)
        x = TorchConv1d(1, 7, 1, 3, self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def fold_weight_norm(weight_g: np.ndarray, weight_v: np.ndarray) -> np.ndarray:
    """torch weight_norm(dim=0): w = g * v / ||v|| with the norm over all
    dims but 0 (models.py removes these at inference, :167-174)."""
    v = np.asarray(weight_v)
    g = np.asarray(weight_g)
    norm = np.sqrt(np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _torch_conv_to_flax(w: np.ndarray, transpose: bool) -> np.ndarray:
    """torch Conv1d weight (out,in,k) or ConvTranspose1d (in,out,k) to
    flax (k,in,out)."""
    if transpose:
        return np.transpose(w, (2, 0, 1))
    return np.transpose(w, (2, 1, 0))


def convert_torch_state_dict(
    state: Dict[str, np.ndarray], cfg: HifiGanConfig = HifiGanConfig()
) -> Dict[str, Any]:
    """Map a released HiFi-GAN generator state_dict (numpy-valued) into this
    module's params. Accepts both weight-normed (weight_g/weight_v) and
    folded (weight) checkpoints."""

    def get_weight(prefix: str) -> np.ndarray:
        if f"{prefix}.weight_v" in state:
            return fold_weight_norm(
                state[f"{prefix}.weight_g"], state[f"{prefix}.weight_v"]
            )
        return np.asarray(state[f"{prefix}.weight"])

    params: Dict[str, Any] = {}

    def put(name: str, prefix: str, transpose: bool = False):
        params[name] = {
            "kernel": _torch_conv_to_flax(get_weight(prefix), transpose),
            "bias": np.asarray(state[f"{prefix}.bias"]),
        }

    put("conv_pre", "conv_pre")
    put("conv_post", "conv_post")
    n_up = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i in range(n_up):
        put(f"ups_{i}", f"ups.{i}", transpose=True)
    for rb in range(n_up * n_kernels):
        block: Dict[str, Any] = {}
        n_dil = len(cfg.resblock_dilation_sizes[rb % n_kernels])
        if cfg.resblock == "1":
            for j in range(n_dil):
                for branch in ("convs1", "convs2"):
                    key = f"resblocks.{rb}.{branch}.{j}"
                    block[f"{branch}_{j}"] = {
                        "kernel": _torch_conv_to_flax(get_weight(key), False),
                        "bias": np.asarray(state[f"{key}.bias"]),
                    }
        else:
            for j in range(n_dil):
                key = f"resblocks.{rb}.convs.{j}"
                block[f"convs_{j}"] = {
                    "kernel": _torch_conv_to_flax(get_weight(key), False),
                    "bias": np.asarray(state[f"{key}.bias"]),
                }
        params[f"resblocks_{rb}"] = block
    return {"params": params}


class Synthesiser:
    """Inference wrapper (reference ``hifigan/__init__.py:10-42``): mel
    (T, 80) -> int16-scaled waveform."""

    def __init__(self, cfg: HifiGanConfig = HifiGanConfig(), params=None,
                 rng=None, dtype=jnp.float32):
        import jax

        self.cfg = cfg
        self.model = Generator(cfg, dtype)
        if params is None:
            mel = jnp.zeros((1, 16, cfg.num_mels))
            params = jax.jit(self.model.init)(
                rng if rng is not None else jax.random.PRNGKey(0), mel
            )
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        wav = np.asarray(self._apply(self.params, mel))
        return (wav * 32768.0).astype(np.float32)
