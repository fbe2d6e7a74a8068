"""Reference-checkpoint (torch) -> JAX parameter conversion.

One-way converter for the reference's enriched Lightning ``.ckpt`` format
(reference ``fastspeech2.py:622-634`` adds stats/phone2id/speaker tables to
the torch pickle) into this framework's flax param tree + sidecar — the
pathway for the BASELINE "mel/waveform allclose to reference checkpoints"
goal.

Name map (reference module attribute -> our flax path):
  phone_embedding.weight                     phone_embedding/embedding
  encoder.layers.{i}.self_attn.in_proj_*     encoder/layer{i}/SelfAttention_0/qkv
  encoder.layers.{i}.self_attn.out_proj      encoder/layer{i}/SelfAttention_0/out
  encoder.layers.{i}.norm{1,2}               encoder/layer{i}/norm{1,2}
  encoder.layers.{i}.conv{1,2}[.0/.1]        encoder/layer{i}/ConvFFN_0/conv*
  variance_adaptor.duration_predictor...     variance_adaptor/duration_predictor
  variance_adaptor.encoders.{var}...         variance_adaptor/encoder_{var}
  speaker_embedding.projection               speaker_embedding/projection
  prior_embeddings.{p}.embedding             prior_embedding_{p}/embedding
  linear                                     mel_head
  fastdiff_linear.{0,1}                      fastdiff_linear{1,2}

Weight-layout rules (verified against torch op semantics in
tests/test_hifigan.py and tests/test_torch_convert.py):
  Linear (out,in) -> kernel (in,out);  Conv1d (out,in,k) -> (k,in,out);
  depthwise Conv1d (C,1,k) -> (k,1,C); grouped Conv1d (G*co,ci,k) ->
  (k,G,ci,co); Embedding (V,H) -> embedding (V,H); LayerNorm weight/bias ->
  scale/bias; MHA packed in_proj (3H,H) -> qkv kernel (H,3H).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from lightningfastspeech2_tpu.core.config import Config, ModelConfig


def _linear(state, prefix):
    return {
        "kernel": np.asarray(state[f"{prefix}.weight"]).T,
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _layernorm(state, prefix):
    return {
        "scale": np.asarray(state[f"{prefix}.weight"]),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _conv1d(state, prefix):
    w = np.asarray(state[f"{prefix}.weight"])  # (out, in, k)
    return {
        "kernel": np.transpose(w, (2, 1, 0)),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _depthwise(state, prefix):
    w = np.asarray(state[f"{prefix}.weight"])  # (C, 1, k)
    return {
        "kernel": np.transpose(w, (2, 1, 0)),  # (k, 1, C)
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def _grouped(state, prefix, groups):
    w = np.asarray(state[f"{prefix}.weight"])  # (G*co, ci, k)
    out_ch, ci, k = w.shape
    co = out_ch // groups
    # (k, G, ci, co): out channel o_global = g*co + o
    kernel = np.transpose(w.reshape(groups, co, ci, k), (3, 0, 2, 1))
    return {"kernel": kernel, "bias": np.asarray(state[f"{prefix}.bias"])}


def _attention(state, prefix):
    wqkv = np.asarray(state[f"{prefix}.in_proj_weight"])  # (3H, H)
    bqkv = np.asarray(state[f"{prefix}.in_proj_bias"])
    return {
        "qkv": {"kernel": wqkv.T, "bias": bqkv},
        "out": _linear(state, f"{prefix}.out_proj"),
    }


def _fft_stack(state, prefix, layers, depthwise, hidden):
    out: Dict[str, Any] = {}
    for i in range(layers):
        p = f"{prefix}.layers.{i}"
        layer: Dict[str, Any] = {
            "SelfAttention_0": _attention(state, f"{p}.self_attn"),
            "norm1": _layernorm(state, f"{p}.norm1"),
            "norm2": _layernorm(state, f"{p}.norm2"),
        }
        ffn: Dict[str, Any] = {}
        if depthwise:
            ffn["conv1_depth"] = _depthwise(state, f"{p}.conv1.0")
            ffn["conv1_point"] = _conv1d(state, f"{p}.conv1.1")
            ffn["conv2_group"] = _grouped(state, f"{p}.conv2.0", hidden)
            ffn["conv2_point"] = _conv1d(state, f"{p}.conv2.1")
        else:
            ffn["conv1"] = _conv1d(state, f"{p}.conv1")
            ffn["conv2"] = _conv1d(state, f"{p}.conv2")
        layer["ConvFFN_0"] = ffn
        out[f"layer{i}"] = layer
    return out


def _variance_conv_layer(state, prefix, depthwise):
    """VarianceConvolutionLayer: Sequential(Transpose(conv), ReLU,
    LayerNorm, Dropout) (model.py:524-561)."""
    out: Dict[str, Any] = {}
    if depthwise:
        out["depth"] = _depthwise(state, f"{prefix}.layers.0.module.0")
        out["point"] = _conv1d(state, f"{prefix}.layers.0.module.1")
    else:
        out["conv"] = _conv1d(state, f"{prefix}.layers.0.module")
    out["LayerNorm_0"] = _layernorm(state, f"{prefix}.layers.2")
    return out


def _variance_predictor(state, prefix, nlayers, depthwise):
    out: Dict[str, Any] = {}
    for i in range(nlayers):
        out[f"conv{i}"] = _variance_conv_layer(
            state, f"{prefix}.layers.{i}", depthwise
        )
    out["linear"] = _linear(state, f"{prefix}.linear")
    return out


def convert_fastspeech2_state_dict(
    state: Dict[str, np.ndarray], cfg: ModelConfig
) -> Dict[str, Any]:
    """Map a reference FastSpeech2 state_dict (numpy-valued, possibly with
    a leading 'model.' prefix stripped) into our flax params tree."""
    state = {k.removeprefix("model."): v for k, v in state.items()}
    params: Dict[str, Any] = {}

    params["phone_embedding"] = {
        "embedding": np.asarray(state["phone_embedding.weight"])
    }
    params["encoder"] = _fft_stack(
        state, "encoder", cfg.encoder.layers, cfg.encoder.depthwise,
        cfg.encoder.hidden,
    )
    params["decoder"] = _fft_stack(
        state, "decoder", cfg.decoder.layers, cfg.decoder.depthwise,
        cfg.decoder.hidden,
    )
    params["mel_head"] = _linear(state, "linear")

    if cfg.speaker_type == "dvector":
        params["speaker_embedding"] = {
            "projection": _linear(state, "speaker_embedding.projection")
        }
    elif cfg.speaker_type == "id":
        params["speaker_embedding"] = {
            "embedding": {
                "embedding": np.asarray(
                    state["speaker_embedding.speaker_embedding.weight"]
                )
            }
        }

    for prior in cfg.priors:
        params[f"prior_embedding_{prior}"] = {
            "embedding": {
                "embedding": np.asarray(
                    state[f"prior_embeddings.{prior}.embedding.weight"]
                )
            }
        }

    va: Dict[str, Any] = {}
    va["duration_predictor"] = _variance_predictor(
        state, "variance_adaptor.duration_predictor",
        cfg.duration.nlayers, cfg.duration.depthwise,
    )
    for i, var in enumerate(cfg.variance.variances):
        enc_prefix = f"variance_adaptor.encoders.{var}"
        enc: Dict[str, Any] = {
            "predictor": _variance_predictor(
                state, f"{enc_prefix}.predictor",
                cfg.variance.nlayers[i], cfg.variance.depthwise,
            ),
            "embedding": {
                "embedding": np.asarray(state[f"{enc_prefix}.embedding.weight"])
            },
        }
        if cfg.variance.transforms[i] == "cwt":
            enc["mean_std_linear"] = _linear(state, f"{enc_prefix}.mean_std_linear")
        va[f"encoder_{var}"] = enc
    params["variance_adaptor"] = va

    if "fastdiff_linear.0.weight" in state:
        params["fastdiff_linear1"] = _linear(state, "fastdiff_linear.0")
        params["fastdiff_linear2"] = _linear(state, "fastdiff_linear.1")

    return {"params": params}


def _conv1x1_to_dense(state, prefix):
    """Conv1d(in,out,1) -> Dense: weight (out,in,1) -> kernel (in,out)."""
    w = np.asarray(state[f"{prefix}.weight"])[:, :, 0]
    return {"kernel": w.T, "bias": np.asarray(state[f"{prefix}.bias"])}


def _dds_conv(state, prefix, num_layers):
    """DilatedDepthSeparableConv (sdp.py:11-73) -> models/sdp.py params."""
    out: Dict[str, Any] = {}
    for i in range(num_layers):
        w = np.asarray(state[f"{prefix}.convs_sep.{i}.weight"])  # (C,1,k)
        out[f"sep{i}_kernel"] = np.transpose(w, (2, 1, 0))  # (k,1,C)
        out[f"sep{i}_bias"] = np.asarray(state[f"{prefix}.convs_sep.{i}.bias"])
        out[f"conv1x1_{i}"] = _conv1x1_to_dense(state, f"{prefix}.convs_1x1.{i}")
        for which in (1, 2):
            out[f"norm{which}_{i}"] = {
                "scale": np.asarray(state[f"{prefix}.norms_{which}.{i}.gamma"]),
                "bias": np.asarray(state[f"{prefix}.norms_{which}.{i}.beta"]),
            }
    return out


def convert_conv_flow(state: Dict[str, np.ndarray], prefix: str,
                      num_layers: int = 3) -> Dict[str, Any]:
    """Reference ConvFlow (sdp.py:100-169) -> models/sdp.py ConvFlow."""
    return {
        "pre": _conv1x1_to_dense(state, f"{prefix}.pre"),
        "convs": _dds_conv(state, f"{prefix}.convs", num_layers),
        "proj": _conv1x1_to_dense(state, f"{prefix}.proj"),
    }


def _maybe_weight_normed_conv(state, prefix, transpose=False):
    """Conv weight that may exist folded or as weight_g/weight_v pairs
    (FastDiff applies weight norm, FastDiff.py:197-215)."""
    from lightningfastspeech2_tpu.vocoder.hifigan import fold_weight_norm

    if f"{prefix}.weight_v" in state:
        w = fold_weight_norm(state[f"{prefix}.weight_g"],
                             state[f"{prefix}.weight_v"])
    else:
        w = np.asarray(state[f"{prefix}.weight"])
    perm = (2, 0, 1) if transpose else (2, 1, 0)  # ConvT1d is (in,out,k)
    return {
        "kernel": np.transpose(w, perm),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def convert_fastdiff_state_dict(state: Dict[str, np.ndarray],
                                n_blocks: int = 3,
                                lvc_layers: int = 4) -> Dict[str, Any]:
    """Map a FastDiff vocoder state_dict (reference
    ``third_party/fastdiff/FastDiff.py`` layout; checkpoints nest it as
    ckpt['state_dict']['model'], train.py:133-135) into our flax params."""
    params: Dict[str, Any] = {}
    params["first_audio_conv"] = _maybe_weight_normed_conv(
        state, "first_audio_conv"
    )
    params["final_conv"] = _maybe_weight_normed_conv(state, "final_conv.0")
    params["fc_t1"] = _linear(state, "fc_t1")
    params["fc_t2"] = _linear(state, "fc_t2")

    for i in range(n_blocks):
        db: Dict[str, Any] = {
            "residual_dense": _maybe_weight_normed_conv(
                state, f"downsample.{i}.residual_dense"
            ),
        }
        for j in range(3):
            db[f"conv_{j}"] = _maybe_weight_normed_conv(
                state, f"downsample.{i}.conv.{j}"
            )
        params[f"downsample_{i}"] = db

    # torch Sequential indices of the 6 convs in KernelPredictor's
    # residual_conv (Dropout/LeakyReLU interleaved, modules.py:296-313)
    res_idx = (1, 3, 6, 8, 11, 13)
    for n in range(n_blocks):
        p = f"lvc_blocks.{n}"
        kp: Dict[str, Any] = {
            "input_conv": _maybe_weight_normed_conv(
                state, f"{p}.kernel_predictor.input_conv.0"
            ),
            "kernel_conv": _maybe_weight_normed_conv(
                state, f"{p}.kernel_predictor.kernel_conv"
            ),
            "bias_conv": _maybe_weight_normed_conv(
                state, f"{p}.kernel_predictor.bias_conv"
            ),
        }
        for k, idx in enumerate(res_idx):
            kp[f"residual_conv_{k}"] = _maybe_weight_normed_conv(
                state, f"{p}.kernel_predictor.residual_conv.{idx}"
            )
        block: Dict[str, Any] = {
            "kernel_predictor": kp,
            "fc_t": _linear(state, f"{p}.fc_t"),
            "upsample": _maybe_weight_normed_conv(
                state, f"{p}.upsample", transpose=True
            ),
        }
        for j in range(lvc_layers):
            block[f"conv_{j}"] = _maybe_weight_normed_conv(
                state, f"{p}.convs.{j}"
            )
        params[f"lvc_blocks_{n}"] = block
    return {"params": params}


def load_reference_checkpoint(path: str, cfg: Optional[Config] = None):
    """Load a reference ``.ckpt`` (torch pickle): returns
    (flax_variables, sidecar dict with stats/phone2id/speaker tables)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    sidecar = {
        key: ckpt[key]
        for key in (
            "stats", "phone2id", "speaker2id", "speaker2dvector",
            "speaker2priors", "speaker_gmms", "dvector_gmms",
        )
        if key in ckpt
    }
    assert cfg is not None, "pass the matching Config for the checkpoint"
    variables = convert_fastspeech2_state_dict(state, cfg.model)
    return variables, sidecar
