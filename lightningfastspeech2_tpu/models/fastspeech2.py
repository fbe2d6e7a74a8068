"""FastSpeech2/LightSpeech acoustic model (flax.linen, TPU-native).

Orchestration mirrors the reference forward pass
(reference ``litfass/fastspeech2/fastspeech2.py:636-784``):

    phones -> embedding -> +pos -> +speaker -> encoder (4 FFT blocks)
    -> +priors -> variance adaptor (durations, variances, length-regulate)
    -> +pos -> +speaker -> decoder (4 FFT blocks) -> linear -> mel (B,T,80)

Differences by design (SURVEY.md 'defects to NOT replicate'):
- masks are True=valid everywhere,
- the every-layer speaker/prior re-injection path actually works,
- no unconditional fastdiff head: the residual head is config-gated,
- static shapes: (B, max_phones) in, (B, max_frames, n_mels) out.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lightningfastspeech2_tpu.core.config import ModelConfig
from lightningfastspeech2_tpu.models.layers import FFTStack, PositionalEncoding
from lightningfastspeech2_tpu.models.variance_adaptor import (
    PriorEmbedding,
    SpeakerEmbedding,
    StatsTree,
    VarianceAdaptor,
    VarianceStats,
    default_stats,
)


class FastSpeech2(nn.Module):
    cfg: ModelConfig
    stats: StatsTree = ()
    prior_stats: StatsTree = ()
    use_fastdiff_head: bool = False
    dtype: jnp.dtype = jnp.float32

    def _prior_stats_for(self, prior: str) -> VarianceStats:
        for name, st in self.prior_stats:
            if name == prior:
                return st
        return VarianceStats()

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        inference: bool = False,
        tf: bool = True,
        oracles: Tuple[str, ...] = (),
        controls: Optional[Dict[str, float]] = None,
        deterministic: bool = True,
        duration_only: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        phones = batch["phones"]  # (B, P) int32, 0 = [PAD]
        phone_mask = phones != 0  # True = valid (reference: src_mask==pad)

        stats = self.stats if self.stats else default_stats(cfg.variance.variances)

        x = nn.Embed(
            cfg.vocab_size, cfg.hidden, dtype=self.dtype, name="phone_embedding"
        )(phones)
        # padding_idx=0 semantics (reference nn.Embedding(padding_idx=0)):
        # zero out pad embeddings
        x = jnp.where(phone_mask[:, :, None], x, 0.0)

        pos_enc = PositionalEncoding(
            cfg.hidden, dropout=cfg.encoder.dropout, name="positional_encoding"
        )
        x = pos_enc(x, deterministic)

        # diffusion d-vector generator (reference fastspeech2.py:640-649):
        # training denoises the utterance d-vector conditioned on the
        # speaker mean; inference samples one from the mean
        speakers = batch.get("speaker")
        if cfg.fastdiff_speakers and cfg.speaker_type == "dvector":
            from lightningfastspeech2_tpu.models.fastdiff_variances import (
                FastDiffSpeakerGenerator,
            )

            spk_gen = FastDiffSpeakerGenerator(
                hidden_dim=512, c_dim=cfg.dvector_dim,
                speaker_dim=cfg.dvector_dim,
                inference_steps=cfg.fastdiff_inference_steps,
                dtype=self.dtype, name="fastdiff_speaker_generator",
            )
            if inference:
                speakers = spk_gen(batch["speaker"], inference=True)
                result_speaker = {"speaker_pred": speakers, "speaker_z": None}
            else:
                utt = batch.get("utterance_dvec", batch["speaker"])
                speaker_pred, speaker_z = spk_gen(batch["speaker"], utt)
                speakers = utt
                result_speaker = {
                    "speaker_pred": speaker_pred, "speaker_z": speaker_z,
                }
        else:
            result_speaker = {}

        speaker_emb = None
        if cfg.speaker_type != "none":
            speaker_module = SpeakerEmbedding(
                cfg.hidden, cfg.speaker_type, cfg.n_speakers, self.dtype,
                name="speaker_embedding",
            )
            speaker_emb = speaker_module(speakers, x.shape[1])

        every_layer = None
        if speaker_emb is not None and not cfg.speaker_embedding_every_layer:
            x = x + speaker_emb
        elif speaker_emb is not None:
            every_layer = speaker_emb

        if cfg.prior_embedding_every_layer and cfg.priors:
            for prior in cfg.priors:
                pe = PriorEmbedding(
                    cfg.hidden, cfg.prior_nbins, self._prior_stats_for(prior),
                    self.dtype, name=f"prior_embedding_{prior}",
                )(batch[f"priors_{prior}"], x.shape[1])
                every_layer = pe if every_layer is None else every_layer + pe

        x = FFTStack(cfg.encoder, self.dtype, name="encoder")(
            x, phone_mask, deterministic, every_layer
        )

        if not cfg.prior_embedding_every_layer:
            for prior in cfg.priors:
                x = x + PriorEmbedding(
                    cfg.hidden, cfg.prior_nbins, self._prior_stats_for(prior),
                    self.dtype, name=f"prior_embedding_{prior}",
                )(batch[f"priors_{prior}"], x.shape[1])

        # static frame length: the batch's mel bucket when present (per-
        # bucket compiled programs), else the config maximum
        if "mel" in batch:
            max_frames = min(batch["mel"].shape[1], cfg.max_frames)
        else:
            max_frames = cfg.max_frames

        if cfg.fastdiff_variances:
            from lightningfastspeech2_tpu.models.fastdiff_variances import (
                FastDiffVarianceAdaptor,
            )

            adaptor_out = FastDiffVarianceAdaptor(
                cfg.variance,
                cfg.duration,
                cfg.hidden,
                max_frames,
                stats,
                cfg.variance.nbins,
                cfg.fastdiff_inference_steps,
                dtype=self.dtype,
                name="variance_adaptor",
            )(
                x,
                phone_mask,
                batch,
                inference=inference,
                deterministic=deterministic,
                duration_only=duration_only,
            )
        else:
            adaptor_out = VarianceAdaptor(
                cfg.variance,
                cfg.duration,
                cfg.hidden,
                max_frames,
                stats,
                cfg.variance.nbins,
                self.dtype,
                name="variance_adaptor",
            )(
                x,
                phone_mask,
                batch,
                inference=inference,
                tf=tf,
                oracles=oracles,
                controls=controls,
                deterministic=deterministic,
                duration_only=duration_only,
            )

        if duration_only:
            # serving duration pass: predicted durations only (the frame
            # bucket chooser in synthesis/generator.py) — no length
            # regulation, no decoder, no mel head
            return {
                "duration_prediction": adaptor_out["duration_prediction"],
                "duration_rounded": adaptor_out["duration_rounded"],
                "phone_mask": phone_mask,
            }

        y = adaptor_out["x"]
        frame_mask = adaptor_out["frame_mask"]
        y = pos_enc(y, deterministic)

        spk_frames = None
        if cfg.speaker_type != "none":
            spk_frames = speaker_module(batch["speaker"], y.shape[1])
            if not cfg.speaker_embedding_every_layer:
                y = y + spk_frames
                dec_extra = None
            else:
                dec_extra = spk_frames
        else:
            dec_extra = None

        y = FFTStack(cfg.decoder, self.dtype, name="decoder")(
            y, frame_mask, deterministic, dec_extra
        )

        mel = nn.Dense(cfg.audio.n_mels, dtype=self.dtype, name="mel_head")(y)
        mel = jnp.where(frame_mask[:, :, None], mel, 0.0)

        result: Dict[str, Any] = {
            "mel": mel,
            "duration_prediction": adaptor_out["duration_prediction"],
            "duration_rounded": adaptor_out["duration_rounded"],
            "phone_mask": phone_mask,
            "frame_mask": frame_mask,
        }
        result.update(result_speaker)
        for var in cfg.variance.variances:
            result[f"variances_{var}"] = adaptor_out[f"variances_{var}"]
            if cfg.fastdiff_variances:
                result[f"variances_{var}_z"] = adaptor_out[f"variances_{var}_z"]
        if cfg.fastdiff_variances:
            result["duration_z"] = adaptor_out["duration_z"]

        # FastDiff residual-mel head (reference fastspeech2.py:390-402,
        # 733-736) — gated, unlike the reference's unconditional call
        if self.use_fastdiff_head and spk_frames is not None:
            out_val = adaptor_out["out"]
            if out_val is None:
                out_val = jnp.zeros_like(y)
            # two stacked Linears, no activation (fastspeech2.py:392-402)
            h = nn.Dense(cfg.hidden, dtype=self.dtype, name="fastdiff_linear1")(
                out_val + spk_frames
            )
            result["fastdiff_var"] = (
                nn.Dense(cfg.audio.n_mels, dtype=self.dtype, name="fastdiff_linear2")(h)
                * 0.1
            )

        return result


def init_params(model: FastSpeech2, rng: jax.Array, batch: Dict[str, jnp.ndarray]):
    # jitted: eager init dispatches hundreds of tiny ops (very slow over a
    # remote TPU link)
    init = jax.jit(lambda rngs, b: model.init(rngs, b, deterministic=True))
    return init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1),
         "sdp": jax.random.fold_in(rng, 2)},
        batch,
    )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def make_dummy_batch(cfg: ModelConfig, batch_size: int = 2, n_phones: int = 32,
                     n_frames: Optional[int] = None, seed: int = 0):
    """Synthetic batch with consistent durations for shape/param init."""
    import numpy as np

    g = np.random.default_rng(seed)
    P = n_phones
    T = n_frames or cfg.max_frames
    phones = np.zeros((batch_size, cfg.max_phones), dtype=np.int32)
    durations = np.zeros((batch_size, cfg.max_phones), dtype=np.int32)
    n_valid = P
    phones[:, :n_valid] = g.integers(1, min(cfg.vocab_size, 50), (batch_size, n_valid))
    per = max(1, min(T, cfg.max_frames) // max(n_valid, 1) - 1)
    durations[:, :n_valid] = per
    batch = {
        "phones": phones,
        "duration": durations,
        "mel": g.standard_normal((batch_size, cfg.max_frames, cfg.audio.n_mels)).astype(
            np.float32
        ),
    }
    for i, var in enumerate(cfg.variance.variances):
        level = cfg.variance.levels[i]
        L = cfg.max_phones if level == "phone" else cfg.max_frames
        if cfg.variance.transforms[i] == "cwt":
            batch[f"variances_{var}_signal"] = np.abs(
                g.standard_normal((batch_size, L))
            ).astype(np.float32) + 5.0
            batch[f"variances_{var}_spectrogram"] = g.standard_normal(
                (batch_size, L, 10)
            ).astype(np.float32)
            batch[f"variances_{var}_mean"] = g.standard_normal(batch_size).astype(
                np.float32
            )
            batch[f"variances_{var}_std"] = np.abs(
                g.standard_normal(batch_size)
            ).astype(np.float32)
        else:
            batch[f"variances_{var}"] = g.standard_normal((batch_size, L)).astype(
                np.float32
            )
    if cfg.speaker_type == "dvector":
        batch["speaker"] = g.standard_normal((batch_size, cfg.dvector_dim)).astype(
            np.float32
        )
    elif cfg.speaker_type == "id":
        batch["speaker"] = g.integers(0, cfg.n_speakers, batch_size).astype(np.int32)
    for prior in cfg.priors:
        batch[f"priors_{prior}"] = g.standard_normal(batch_size).astype(np.float32)
    return batch


def count_params(mcfg: ModelConfig, dtype=jnp.float32) -> int:
    """Exact parameter count via ``jax.eval_shape`` (no FLOPs, no memory).

    Used by bench.py to emit ``n_params`` next to every throughput row so
    machine-readable outputs carry the measured scale (the reference
    README's 27M/76M claims are not reproducible from its configs —
    BASELINE.md "Param-count correction")."""
    model = FastSpeech2(mcfg, dtype=dtype)
    batch = make_dummy_batch(mcfg, batch_size=1,
                             n_phones=max(mcfg.max_phones - 8, 1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sdp": jax.random.PRNGKey(2)}
    shapes = jax.eval_shape(
        lambda: model.init(rngs, batch, deterministic=True))
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(shapes)))
