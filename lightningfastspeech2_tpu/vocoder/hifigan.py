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

# Cap on the trio-fused stage kernel's signal tile (generator_apply_fused):
# measured on v5e (scripts/profile_trio.py, B=4 Tmel=1024, bf16) tile 1024
# beats 2048 (1,430 vs 1,385 audio-s/s — the trio's 18 resident tap stacks
# leave less VMEM for the signal tile) and 4096 fails to compile. Callers
# tuning tile_m on a larger-VMEM chip should raise this constant too.
TRIO_TILE_CAP = 1024


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
    w (k,in,out). out length = (T-1)*stride - 2*padding + k.

    Kept as the oracle for ``conv_transpose1d_matmul`` (the production
    path): XLA lowers lhs_dilation by materializing the zero-stuffed
    input, wasting (stride-1)/stride of the MXU work."""
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x, w[::-1],  # transpose conv correlates with the flipped kernel
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b[None, None, :] if b is not None else out


def _transpose_conv_phase_weight(w, stride: int, padding: int):
    """Reshape a transposed-conv kernel (k, cin, cout) into the dense
    phase-decomposition matrix (n_off * cin, stride * cout).

    out[m*s + q] = sum_o x[m + o] @ W[o-tap]: the tap index into w is
    j = q + padding - o*s; entries with j outside [0, k) are zero. This
    turns the whole transposed conv into ONE matmul whose output lanes
    (s*cout >= 512 for every HiFi-GAN stage) fill the MXU, instead of a
    conv over a zero-stuffed 8x-length input.
    """
    k, cin, cout = w.shape
    s, p = stride, padding
    o_min = -((k - 1 - p) // s)
    o_max = (s - 1 + p) // s
    offs = np.arange(o_min, o_max + 1)
    q = np.arange(s)
    j = q[None, :] + p - offs[:, None] * s          # (n_off, s)
    valid = (j >= 0) & (j < k)
    tap = np.where(valid, j, 0)
    w2 = jnp.take(w, jnp.asarray(tap.reshape(-1)), axis=0)
    w2 = w2.reshape(len(offs), s, cin, cout)
    w2 = jnp.where(jnp.asarray(valid)[:, :, None, None], w2, 0)
    # (n_off, s, cin, cout) -> (n_off, cin, s*cout): a regular conv kernel
    # of width n_off whose output channels interleave (phase, channel)
    w2 = w2.transpose(0, 2, 1, 3).reshape(len(offs), cin, s * cout)
    return w2, int(o_min), int(o_max)


def conv_transpose1d_matmul(x, w, b, stride: int, padding: int):
    """torch-parity ConvTranspose1d as a subpixel conv (see
    ``_transpose_conv_phase_weight``): a width-``n_off`` dense conv
    producing ``stride*cout`` channels, reshaped to interleave the phases
    into time. x (B,T,cin), w (k,cin,cout)."""
    B, T, cin = x.shape
    k, _, cout = w.shape
    s, p = stride, padding
    L_out = (T - 1) * s + k - 2 * p
    m_count = -(-L_out // s)
    w2, o_min, o_max = _transpose_conv_phase_weight(w, s, p)
    left = max(0, -o_min)
    right = max(0, m_count - 1 + o_max - (T - 1))
    y = jax.lax.conv_general_dilated(
        x, w2, window_strides=(1,), padding=[(left, right)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).reshape(B, m_count * s, cout)
    y = y[:, :L_out]
    return y + b[None, None, :] if b is not None else y


# ---------------------------------------------------------------------------
# folded ("time-into-lanes") dilated convolution
# ---------------------------------------------------------------------------
#
# HiFi-GAN's late stages run dilated convs over very long signals with 32-64
# channels; a (taps*C, C) matmul uses <=25% of the MXU's 128 output lanes
# (measured 2.7 TFLOP/s at C=32 on v5e). Folding f consecutive samples into
# the channel dim gives a (B, L/f, f*C) signal where leaky_relu and residual
# adds are fold-invariant, and a same-padded dilated conv becomes a stride-1
# dilation-1 conv with an (nb, f*C, f*Cout) structured-sparse weight:
#
#   y[m*f + r] = sum_j x[m*f + r - p + d*j] @ w[j]
#   => yf[m, r*Cout:(r+1)*Cout] += xf[m + t, qr*C:(qr+1)*C] @ w[j]
#      where r - p + d*j = t*f + qr
#
# The zero blocks waste ~2.5x FLOPs but the f*C>=256 lanes run at ~80
# TFLOP/s instead of ~3, a large net win (see BASELINE.md round-2 notes).


def _folded_conv_weight(w, dilation: int, fold: int):
    """(k, C, Cout) dilated-conv kernel -> (nb, fold*C, fold*Cout) folded
    kernel + (left, right) block padding for "same" semantics."""
    k, C, Cout = w.shape
    d, f = dilation, fold
    p = d * (k - 1) // 2
    left = -(-p // f)
    right = (f - 1 + p) // f
    nb = left + right + 1
    t_idx, qr_idx, r_idx, j_idx = [], [], [], []
    for r in range(f):
        for j in range(k):
            delta = r - p + d * j
            t_idx.append(delta // f + left)
            qr_idx.append(delta % f)
            r_idx.append(r)
            j_idx.append(j)
    W2 = jnp.zeros((nb, f, C, f, Cout), w.dtype)
    W2 = W2.at[
        jnp.asarray(t_idx), jnp.asarray(qr_idx), :, jnp.asarray(r_idx), :
    ].set(w[jnp.asarray(j_idx)])
    return W2.reshape(nb, f * C, f * Cout), left, right


def conv1d_folded(xf, w, b, dilation: int, fold: int):
    """Same-padded dilated conv applied to a folded signal.

    xf (B, M, fold*C) is x (B, M*fold, C) with time folded into channels;
    w (k, C, Cout), b (Cout,). Returns the folded output (B, M, fold*Cout)
    == fold(conv1d(x, w, b, dilation, d*(k-1)//2)).
    """
    W2, left, right = _folded_conv_weight(w, dilation, fold)
    y = jax.lax.conv_general_dilated(
        xf, W2, window_strides=(1,), padding=[(left, right)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if b is not None:
        y = y + jnp.tile(b, fold)[None, None, :]
    return y


class TorchConv1d(nn.Module):
    """torch-parity Conv1d. With ``fold`` > 1 the input/output are in the
    folded (B, M, fold*C) layout (conv1d_folded); requires same-padding,
    i.e. ``padding == dilation*(kernel_size-1)//2``."""

    features: int
    kernel_size: int
    dilation: int = 1
    padding: int = 0
    dtype: jnp.dtype = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // self.fold
        w = self.param(
            "kernel", nn.initializers.normal(0.01),
            (self.kernel_size, cin, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.fold > 1:
            assert self.padding == self.dilation * (self.kernel_size - 1) // 2
            return conv1d_folded(
                x.astype(self.dtype), w.astype(self.dtype),
                b.astype(self.dtype), self.dilation, self.fold,
            )
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
        # A/B on v5e: XLA's lhs_dilation lowering beats the subpixel-conv
        # formulation (conv_transpose1d_matmul) for these shapes — the
        # s*cout-channel conv + reshape costs more than the zero-stuffed
        # input saves (71 vs 123 ms full-model, B=4 T=1024 bf16)
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
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = TorchConv1d(
                self.channels, self.kernel_size, d,
                _get_padding(self.kernel_size, d), self.dtype, self.fold,
                name=f"convs1_{i}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = TorchConv1d(
                self.channels, self.kernel_size, 1,
                _get_padding(self.kernel_size, 1), self.dtype, self.fold,
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
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = TorchConv1d(
                self.channels, self.kernel_size, d,
                _get_padding(self.kernel_size, d), self.dtype, self.fold,
                name=f"convs_{i}",
            )(xt)
            x = x + xt
        return x


class Generator(nn.Module):
    """mel (B, T, 80) -> waveform (B, T*hop) in [-1, 1]
    (models.py:112-165)."""

    cfg: HifiGanConfig = HifiGanConfig()
    dtype: jnp.dtype = jnp.float32
    # fold sub-128-channel resblock stages into (B, L/f, f*C) so their
    # convs fill the MXU lanes. Identical params and outputs. Measured
    # on v5e (device-side scan, B=4 T=1024): standalone resblock groups
    # speed up 1.5-2.4x, but the FULL model does not (94.5 ms dense vs
    # 99.5 ms folded f32; 68 vs 70 ms bf16) — XLA's conv lowering spends
    # the time elsewhere. Kept off; the folded-weight construction is
    # reused by the fused Pallas resblock kernel.
    fold_resblocks: bool = False

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
            # run sub-128-channel resblock groups in the folded layout so
            # their convs fill the MXU lanes (see conv1d_folded); the
            # residual adds and leaky_relus inside are fold-invariant
            fold = 256 // ch if ch < 128 and self.fold_resblocks else 1
            if fold > 1 and x.shape[1] % fold == 0:
                B_, L_, _ = x.shape
                x = x.reshape(B_, L_ // fold, fold * ch)
            else:
                fold = 1
            acc = None
            for j, (k, ds) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                out = res(ch, k, tuple(ds), self.dtype, fold,
                          name=f"resblocks_{i * n_kernels + j}")(x)
                acc = out if acc is None else acc + out
            x = acc / n_kernels
            if fold > 1:
                B_, M_, _ = x.shape
                x = x.reshape(B_, M_ * fold, ch)
        # models.py:161 uses F.leaky_relu's DEFAULT slope (0.01) here,
        # unlike every other activation in the network
        x = nn.leaky_relu(x, 0.01)
        x = TorchConv1d(1, 7, 1, 3, self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# fused-kernel inference path
# ---------------------------------------------------------------------------


def generator_apply_fused(params, mel, cfg: HifiGanConfig = HifiGanConfig(),
                          dtype=jnp.bfloat16, tile_m: int = 2048,
                          interpret: bool = False, use_trio: bool = True):
    """Generator forward with the resblock groups on the fused Pallas
    kernel (ops/pallas_hifigan.py) — same params pytree, same output as
    ``Generator.apply`` at the working dtype.

    The late stages' C<128 convs under-fill the MXU lanes (measured 3-10%
    MFU on v5e); the kernel runs them in a folded (L/f, f*C) layout with
    all six convs of each resblock resident in VMEM. bf16 only: at f32
    the per-resblock tap weights for the C=256 stage exceed VMEM.

    ``tile_m`` applies as given to the per-resblock kernel (C=256 stage);
    trio-fused stages clamp it to ``TRIO_TILE_CAP`` (module constant, see
    its comment for the v5e measurement behind the cap).
    """
    from ..ops.pallas_hifigan import (
        fused_resblock,
        fused_resblock_trio,
        resblock_taps,
    )

    c = cfg
    p = params["params"]

    def wb(name):
        return (jnp.asarray(p[name]["kernel"], dtype),
                jnp.asarray(p[name]["bias"], dtype))

    w, b = wb("conv_pre")
    x = conv1d(mel.astype(dtype), w, b, 1, 3)
    n_kernels = len(c.resblock_kernel_sizes)
    for i, (rate, k_up) in enumerate(
        zip(c.upsample_rates, c.upsample_kernel_sizes)
    ):
        x = nn.leaky_relu(x, LRELU_SLOPE)
        ch = c.upsample_initial_channel // (2 ** (i + 1))
        w, b = wb(f"ups_{i}")
        x = conv_transpose1d(x, w, b, rate, (k_up - rate) // 2)
        fold = max(128 // ch, 1)
        B, L, _ = x.shape
        xf = x.reshape(B, L // fold, fold * ch)
        if use_trio and fold * ch <= 128:
            # whole trio from one input DMA: the stage's three resblocks
            # (18 convs) stay VMEM-resident and are averaged in-kernel,
            # saving 2 reads + 2 writes + the XLA average per stage
            weights, shifts, biases = [], [], []
            for j, (k, ds) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                rb = p[f"resblocks_{i * n_kernels + j}"]
                w_j, s_j, b_j = resblock_taps(rb, k, tuple(ds), fold, dtype)
                weights += w_j
                shifts += s_j
                biases.append(b_j)
            x = fused_resblock_trio(
                xf, weights, shifts, jnp.concatenate(biases, axis=0),
                n_res=n_kernels, tile_m=min(tile_m, TRIO_TILE_CAP),
                interpret=interpret,
            ).reshape(B, L, ch)
        else:
            # C=256 first stage: the trio's tap stacks exceed VMEM
            acc = None
            for j, (k, ds) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                rb = p[f"resblocks_{i * n_kernels + j}"]
                weights, shifts, biases = resblock_taps(
                    rb, k, tuple(ds), fold, dtype)
                y = fused_resblock(xf, weights, shifts, biases,
                                   tile_m=tile_m, interpret=interpret)
                acc = y if acc is None else acc + y
            x = (acc / n_kernels).reshape(B, L, ch)
    x = nn.leaky_relu(x, 0.01)
    w, b = wb("conv_post")
    x = conv1d(x, w, b, 1, 3)
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


def load_torch_generator(
    path, cfg: HifiGanConfig = HifiGanConfig()
) -> Dict[str, Any]:
    """Load a torch HiFi-GAN generator checkpoint from disk (the released
    ``generator_universal.pth.tar`` layout, optionally nested under a
    'generator' key) and convert it to this module's params."""
    import torch

    state = torch.load(path, map_location="cpu")
    if "generator" in state:
        state = state["generator"]
    state = {k: v.numpy() for k, v in state.items()}
    import jax

    return jax.tree_util.tree_map(
        np.asarray, convert_torch_state_dict(state, cfg)
    )


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
    (T, 80) -> int16-scaled waveform.

    At bf16 on a real TPU the resblocks run on the fused Pallas kernel
    (ops/pallas_hifigan.py, 1.9x over the XLA path on v5e, identical
    bf16 output); ``fused=False`` opts out, other backends fall back to
    the XLA path automatically (Mosaic is TPU-only)."""

    def __init__(self, cfg: HifiGanConfig = HifiGanConfig(), params=None,
                 rng=None, dtype=jnp.float32, fused: bool = True):
        import jax

        self.cfg = cfg
        self.model = Generator(cfg, dtype)
        if params is None:
            mel = jnp.zeros((1, 16, cfg.num_mels))
            params = jax.jit(self.model.init)(
                rng if rng is not None else jax.random.PRNGKey(0), mel
            )
        self.params = params
        use_fused = (
            fused and dtype == jnp.bfloat16
            and jax.default_backend() not in ("cpu",)
        )
        if use_fused:
            self._apply = jax.jit(
                lambda p, m: generator_apply_fused(p, m, cfg, dtype=dtype)
            )
        else:
            self._apply = jax.jit(self.model.apply)

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        wav = np.asarray(self._apply(self.params, mel))
        return (wav * 32768.0).astype(np.float32)
