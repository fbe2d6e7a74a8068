"""On-device prosody extraction: raw waveforms in, features computed on TPU.

The BASELINE north star moves the reference's CPU-worker feature extraction
(pyworld/WADA/RMS per DataLoader item, ``datasets.py:355-474``) onto the
accelerator. The host pipeline then only decodes/resamples audio and pads
it to wav buckets; mel, energy, YIN pitch, WADA SNR, NaN interpolation,
silence masking, phone-averaging and z-normalization all run inside the
jitted train step (every implementation in audio/ is pure JAX).

CWT-transformed variances run on-device too: the ragged wavelet lengths
become dynamic-length kernels inside static buffers
(:func:`audio.cwt.decompose_padded`), so log-pitch CWT spectrograms +
utterance mean/std are computed inside the same jitted step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.audio import cwt as cwt_mod
from lightningfastspeech2_tpu.audio import features as feat
from lightningfastspeech2_tpu.audio import mel as mel_mod
from lightningfastspeech2_tpu.audio import pitch as pitch_mod
from lightningfastspeech2_tpu.audio import snr as snr_mod
from lightningfastspeech2_tpu.core.config import Config
from lightningfastspeech2_tpu.models.variance_adaptor import StatsTree
from lightningfastspeech2_tpu.ops import length_regulator as lr


def extract_batch_features(
    wav: jnp.ndarray,            # (B, T*hop) padded raw audio
    durations: jnp.ndarray,      # (B, P)
    silence_phone: jnp.ndarray,  # (B, P) True where phone is a [..] token
    cfg: Config,
    stats: StatsTree,
    max_frames: int,
    phones_lengths: jnp.ndarray = None,  # (B,) true phone counts
) -> Dict[str, jnp.ndarray]:
    """Returns mel (B, T, n_mels) + variances_* matching the host pipeline
    (datasets.py:562-648 semantics), all jitted. ``phones_lengths`` is
    required for phone-level CWT variances (masks the ragged-length
    decomposition); other configs derive everything from ``durations``."""
    a = cfg.model.audio
    vcfg = cfg.model.variance
    stats_map = dict(stats)

    def per_item(w):
        out = {
            "mel": mel_mod.mel_spectrogram(w, a)[:max_frames],
            "energy": feat.frame_energy(w, a.hop_length, a.win_length)[:max_frames],
        }
        if "pitch" in vcfg.variances:
            out["pitch"] = pitch_mod.track(
                w, a.sampling_rate, a.hop_length, a.win_length
            )[:max_frames]
        if "snr" in vcfg.variances:
            out["snr"] = snr_mod.windowed_wada(
                w, a.hop_length, a.win_length
            )[:max_frames]
        return out

    raw = jax.vmap(per_item)(wav)

    # expand phone-level silence to the frame grid (TTSDataset._expand)
    silence_frames, _ = lr.regulate(
        silence_phone.astype(jnp.float32), durations, max_frames
    )
    silence_frames = silence_frames > 0.5

    frame_lengths = jnp.minimum(durations.sum(axis=1), max_frames)

    if "srmr" in vcfg.variances:
        from lightningfastspeech2_tpu.audio.srmr import frame_srmr_padded

        # true sample count approximated as frames*hop (raw batches do
        # not carry exact wav lengths; the window count can differ by at
        # most one vs the host at a hop boundary)
        wav_lengths = frame_lengths * a.hop_length
        raw["srmr"] = jax.vmap(
            lambda w, l, nf: frame_srmr_padded(
                w, l, nf, max_frames, a.sampling_rate)
        )(wav, wav_lengths, frame_lengths)

    result: Dict[str, jnp.ndarray] = {"mel": raw["mel"]}
    for i, var in enumerate(vcfg.variances):
        sig = raw[var].astype(jnp.float32)
        if var == "pitch":
            sig = jnp.where(sig == 0, jnp.nan, sig)
            sig = jnp.where(silence_frames, jnp.nan, sig)
            all_nan = jnp.all(jnp.isnan(sig), axis=1, keepdims=True)
            sig = jnp.where(all_nan, 1e-7, sig)
            sig = jax.vmap(feat.interpolate_nans_jnp)(sig)
        elif var == "snr":
            sig = jnp.where(silence_frames, jnp.nan, sig)
            all_nan = jnp.all(jnp.isnan(sig), axis=1, keepdims=True)
            sig = jax.vmap(feat.interpolate_nans_jnp)(sig)
            sig = jnp.where(all_nan, 0.0, sig)
        if vcfg.levels[i] == "phone":
            P = durations.shape[1]
            sig = jax.vmap(
                lambda s, d: feat.phone_average_jnp(s, d, P)
            )(sig, durations)
            lengths = phones_lengths
        else:
            lengths = frame_lengths
        if vcfg.transforms[i] == "cwt":
            if lengths is None:
                raise ValueError(
                    "phone-level CWT on-device extraction needs "
                    "phones_lengths (present in raw-mode batches)"
                )
            dec = jax.vmap(cwt_mod.decompose_padded)(
                sig, lengths.astype(jnp.int32)
            )
            # host stores the cleaned linear signal (dataset.py:366: the
            # model's teacher path re-logs it); padding stays 0
            valid = (jnp.arange(sig.shape[1])[None]
                     < lengths.astype(jnp.int32)[:, None])
            result[f"variances_{var}_signal"] = jnp.where(
                valid, jnp.exp(dec["signal"]), 0.0
            )
            result[f"variances_{var}_spectrogram"] = dec["spectrogram"]
            result[f"variances_{var}_mean"] = dec["mean"]
            result[f"variances_{var}_std"] = dec["std"]
            continue
        if vcfg.transforms[i] == "log":
            sig = jnp.log(jnp.maximum(sig, 1e-10))
        else:
            st = stats_map.get(var)
            if st is not None:
                sig = (sig - st.mean) / st.std
        result[f"variances_{var}"] = sig
    return result


def augment_batch_with_features(batch, cfg: Config, stats: StatsTree):
    """Replace/insert feature arrays computed from batch['wav']; call
    inside a jitted step. Requires 'wav', 'duration', 'silence_phone'."""
    from lightningfastspeech2_tpu.data.wav import dequantize

    wav = dequantize(batch["wav"])  # int16 transfer encoding, if any
    max_frames = wav.shape[1] // cfg.model.audio.hop_length
    max_frames = min(max_frames, cfg.model.max_frames)
    feats = extract_batch_features(
        wav, batch["duration"], batch["silence_phone"], cfg, stats,
        max_frames, phones_lengths=batch.get("phones_lengths"),
    )
    out = dict(batch)
    out["wav"] = wav
    out.update(feats)
    return out
