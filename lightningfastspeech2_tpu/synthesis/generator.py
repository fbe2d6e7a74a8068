"""End-to-end speech generation service.

Mirrors the reference's ``SpeechGenerator``
(reference ``litfass/synthesis/generator.py:37-224``): text -> G2P -> phone
ids; speaker selection (explicit, or random with priors available); prior
selection (sample from the speaker's observed priors / GMM sample / CLI
override); acoustic model inference; vocoder (HiFi-GAN, or FastDiff N-step
when wired); restoration (synthesis/restore.AudioRestorer, the
VoiceFixer-slot analog) or any other post-process callable; waveform save
at the post-processor's output rate (reference saves VoiceFixer output at
44.1 kHz, generator.py:81-94).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.core.bucketing import Bucketer, pad_to
from lightningfastspeech2_tpu.data import wav as wav_io
from lightningfastspeech2_tpu.data.vocab import Vocab
from lightningfastspeech2_tpu.synthesis.g2p import G2P


class SpeechGenerator:
    def __init__(
        self,
        cfg: C.Config,
        model,  # FastSpeech2 flax module
        params,
        vocab: Vocab,
        g2p: G2P,
        synthesiser: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        speaker2dvector: Optional[Dict[str, np.ndarray]] = None,
        speaker2id: Optional[Dict[str, int]] = None,
        speaker2priors: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
        speaker_gmms: Optional[Dict[str, Any]] = None,
        dvector_gmms: Optional[Dict[str, Any]] = None,
        postprocess: Optional[Callable[[np.ndarray, int], np.ndarray]] = None,
    ):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.vocab = vocab
        self.g2p = g2p
        self.synthesiser = synthesiser
        self.speaker2dvector = speaker2dvector or {}
        self.speaker2id = speaker2id or {}
        self.speaker2priors = speaker2priors or {}
        self.speaker_gmms = speaker_gmms or {}
        self.dvector_gmms = dvector_gmms or {}
        self.postprocess = postprocess
        # a restoring post-processor may change the output rate (VoiceFixer
        # outputs 44.1 kHz; reference save_audio, generator.py:81-94)
        self.output_sampling_rate = (
            getattr(postprocess, "output_sampling_rate", None)
            or cfg.model.audio.sampling_rate
        )
        self.bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames)
        self._infer = jax.jit(
            lambda params, batch, rng: self.model.apply(
                {"params": params}, batch, inference=True, deterministic=True,
                rngs={"sdp": rng},
            )
        )
        # Frame-bucketed serving (VERDICT r3 item 7): the acoustic pass at
        # a full max_frames bucket pays a ~4x padding tax at realistic
        # utterance lengths (BENCH_r03: 6,024 vs 24,406 audio-s/s). Two
        # passes instead: a cheap duration-only program (encoder + duration
        # tower, no length regulation / decoder / mel head) picks the frame
        # bucket, then a per-bucket-compiled full program synthesizes at
        # the right-sized static T. Durations re-predicted in pass 2 are
        # bit-identical (same params, same rng); if a prediction still
        # exceeds the bucket the length regulator truncates — the same
        # bounded-length contract as the reference's max_len clamp
        # (reference model.py:355). Opt out with LFS2_SERVE_BUCKETS=0.
        import os as _os

        self.frame_bucketing = _os.environ.get(
            "LFS2_SERVE_BUCKETS", "1").lower() not in ("0", "false", "off")
        # Vocoder bucketing (round 5): vocode the mel at its STATIC
        # bucket length (padded frames forced to the front-end's silence
        # floor, log10(1e-6) = -6) and trim the waveform to
        # n_valid_frames*hop. Without this every distinct utterance
        # length compiled its own vocoder program — measured: the
        # serving-path bench spent >10 min in per-length vocoder
        # compiles through the tunnel. Per-bucket static shapes are the
        # XLA-native contract everywhere else in this repo; edge cost is
        # one receptive field of synthesized trailing silence, exactly
        # like a naturally-ending utterance. Opt out with
        # LFS2_VOCODER_BUCKETS=0 (per-length exact vocoding).
        self.vocoder_bucketing = _os.environ.get(
            "LFS2_VOCODER_BUCKETS", "1").lower() not in ("0", "false",
                                                         "off")
        self._dur_infer = jax.jit(
            lambda params, batch, rng: self.model.apply(
                {"params": params}, batch, inference=True, deterministic=True,
                duration_only=True, rngs={"sdp": rng},
            ),
            static_argnames=(),
        )
        self._bucket_infer: Dict[int, Callable] = {}

    def _infer_at(self, T: int) -> Callable:
        """Jitted full-inference program with max_frames=T (params shared —
        T only changes activation shapes, never the param tree)."""
        if T >= self.cfg.model.max_frames:
            return self._infer
        fn = self._bucket_infer.get(T)
        if fn is None:
            model_T = self.model.clone(
                cfg=C.replace(self.cfg.model, max_frames=T)
            )
            fn = jax.jit(
                lambda params, batch, rng: model_T.apply(
                    {"params": params}, batch, inference=True,
                    deterministic=True, rngs={"sdp": rng},
                )
            )
            self._bucket_infer[T] = fn
        return fn

    @property
    def sampling_rate(self) -> int:
        return self.cfg.model.audio.sampling_rate

    def set_postprocess(self, fn) -> None:
        """Install a post-processor after construction, keeping the save
        rate in sync (a restorer outputs 44.1 kHz)."""
        self.postprocess = fn
        self.output_sampling_rate = (
            getattr(fn, "output_sampling_rate", None)
            or self.cfg.model.audio.sampling_rate
        )

    # ------------------------------------------------------------ text path
    def text_to_ids(self, text: str) -> np.ndarray:
        phones = self.g2p(text)
        ids = [self.vocab.phone2id[p] for p in phones if p in self.vocab.phone2id]
        if phones and not ids:
            # every phone fell outside the checkpoint's vocabulary —
            # synthesis would be an empty (or all-pad) utterance. Common
            # cause: a lexicon/neural G2P emitting a different phone set
            # than the corpus the model trained on.
            import logging

            logging.getLogger(__name__).warning(
                "text_to_ids: none of %d G2P phones exist in the model "
                "vocabulary (%d entries) — synthesis will be empty. "
                "Check --lexicon_path/--g2p_model against the training "
                "corpus phone set.", len(phones), len(self.vocab.phone2id))
        return np.asarray(ids, dtype=np.int64)

    def _pick_speaker(
        self,
        speaker: Optional[str],
        rng: np.random.Generator,
        sample_dvector: bool = False,
    ):
        mcfg = self.cfg.model
        if mcfg.speaker_type == "dvector":
            if speaker is None:
                names = list(self.speaker2dvector)
                if self.cfg.model.priors and self.speaker2priors:
                    names = [n for n in names if n in self.speaker2priors] or names
                speaker = names[int(rng.integers(len(names)))]
            if sample_dvector and speaker in self.dvector_gmms:
                # novel voice near this speaker: draw from the per-speaker
                # d-vector GMM instead of the table mean (reference fits
                # them at fastspeech2.py:492-499; sampling per
                # generate.py:216-217)
                dvec = self.dvector_gmms[speaker].sample(
                    random_state=int(rng.integers(2 ** 31))
                )[0][0]
                return speaker, np.asarray(dvec, np.float32)
            return speaker, np.asarray(self.speaker2dvector[speaker], np.float32)
        if mcfg.speaker_type == "id":
            if speaker is None:
                speaker = list(self.speaker2id)[int(rng.integers(len(self.speaker2id)))]
            return speaker, np.int64(self.speaker2id[speaker])
        return None, None

    def _pick_priors(
        self,
        speaker_name: Optional[str],
        strategy: str,
        overrides: Optional[Dict[str, float]],
        rng: np.random.Generator,
    ) -> Dict[str, float]:
        priors = self.cfg.model.priors
        values: Dict[str, float] = {}
        if not priors:
            return values
        if strategy == "sample" and speaker_name in self.speaker2priors:
            history = self.speaker2priors[speaker_name]
            idx = int(rng.integers(len(history[priors[0]])))
            values = {p: float(history[p][idx]) for p in priors}
        elif strategy == "gmm" and speaker_name in self.speaker_gmms:
            sample = self.speaker_gmms[speaker_name].sample()[0][0]
            values = {p: float(sample[i]) for i, p in enumerate(priors)}
        else:
            values = {p: 0.0 for p in priors}
        for p, v in (overrides or {}).items():
            if v != -1:
                values[p] = v
        return values

    # ------------------------------------------------------------ synthesis
    def generate_from_text(
        self,
        text: str,
        speaker: Optional[str] = None,
        seed: Optional[int] = None,
        prior_strategy: str = "sample",
        prior_values: Optional[Dict[str, float]] = None,
        sample_dvector: bool = False,
    ) -> np.ndarray:
        rng = np.random.default_rng(seed)
        ids = self.text_to_ids(text)
        P = self.bucketer.phone_bucket(len(ids))
        batch: Dict[str, np.ndarray] = {
            "phones": pad_to(ids, P)[None, :],
        }
        speaker_name, spk = self._pick_speaker(speaker, rng, sample_dvector)
        if spk is not None:
            batch["speaker"] = np.asarray(spk)[None] if np.ndim(spk) else np.asarray(
                [spk]
            )
        for p, v in self._pick_priors(
            speaker_name, prior_strategy, prior_values, rng
        ).items():
            batch[f"priors_{p}"] = np.asarray([v], np.float32)
        return self.generate_samples(batch)[0]

    def generate_samples(self, batch: Dict[str, np.ndarray]) -> List[np.ndarray]:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng = jax.random.PRNGKey(0)
        if self.frame_bucketing:
            durs = self._dur_infer(self.params, jbatch, rng)
            need = int(np.max(np.asarray(
                jnp.sum(durs["duration_rounded"], axis=-1))))
            T = self.bucketer.frame_bucket(need)
            result = self._infer_at(T)(self.params, jbatch, rng)
        else:
            result = self._infer(self.params, jbatch, rng)
        mel_out = result["mel"]
        if "fastdiff_var" in result:
            # FastDiff-conditioned checkpoints vocode mel + the x0.1
            # residual head (reference fastspeech2.py:733-736)
            mel_out = mel_out + result["fastdiff_var"]
        mels = np.asarray(mel_out, np.float32)
        mask = np.asarray(result["frame_mask"])
        hop = self.cfg.model.audio.hop_length
        audios = []
        for i in range(len(mels)):
            mel = mels[i][mask[i]]
            if self.synthesiser is not None:
                if self.vocoder_bucketing:
                    # static bucket-length vocoder input; padded frames
                    # at the log-mel silence floor, wav cut at the valid
                    # frame count (see __init__ comment)
                    mel_in = np.where(
                        mask[i][:, None], mels[i], np.float32(-6.0))
                    wav = np.asarray(self.synthesiser(mel_in), np.float32)
                    if wav.ndim > 1:
                        wav = wav[0]
                    wav = wav[: int(mask[i].sum()) * hop] / 32768.0
                else:
                    wav = np.asarray(self.synthesiser(mel), np.float32)
                    if wav.ndim > 1:
                        wav = wav[0]
                    wav = wav / 32768.0
            else:  # no vocoder: return mel frames flattened as a stub signal
                wav = mel.reshape(-1)
            if self.postprocess is not None:
                wav = self.postprocess(wav, self.sampling_rate)
            audios.append(wav)
        return audios

    def save_audio(self, path, audio: np.ndarray) -> None:
        wav_io.write(path, audio, self.output_sampling_rate)


class PostProcessChain:
    """Compose post-vocoder processors (restoration, augmentations),
    threading the sample rate through rate-changing stages. The reference
    applies VoiceFixer and augmentations as separate ad-hoc blocks (and
    augments the *pre-restore* audio, generator.py:197-201, losing the
    augmentations whenever VoiceFixer is on — not replicated)."""

    def __init__(self, *fns):
        self.fns = [f for f in fns if f is not None]
        rate = None
        for f in self.fns:
            rate = getattr(f, "output_sampling_rate", rate)
        self.output_sampling_rate = rate  # None -> rate unchanged

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        for f in self.fns:
            wav = f(wav, sr)
            sr = getattr(f, "output_sampling_rate", sr)
        return wav
