"""Online-prosody TTS dataset over forced-aligned corpora.

Re-design of the reference's ``TTSDataset``
(reference ``litfass/dataset/datasets.py:47-1041``) with the coupling
inverted (SURVEY.md §1 quirk): the dataset is independent of the model, and
batches are collated to STATIC bucket shapes for XLA.

Per-utterance pipeline (mirrors ``__getitem__``, ``datasets.py:355-474``):
 wav -> resample -> [start:end] slice -> peak normalize
     -> log-mel (T, 80)                        audio/mel.py
     -> durations (+ augmentation)             data/alignment.py
     -> silence masks (expanded + phone level)
     -> variances: pitch (NaN at silence, interpolated), energy,
        WADA SNR, [SRMR]                       audio/{pitch,features,snr}.py
     -> phone-level averaging / cwt / log / z-norm transforms
     -> utterance priors over non-silent frames

Feature extraction runs through jitted JAX on the host CPU backend, padded
to wav-length buckets so each bucket compiles once.
"""

from __future__ import annotations

import functools
import json
import hashlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from lightningfastspeech2_tpu.audio import cwt as cwt_mod
from lightningfastspeech2_tpu.audio import features, mel as mel_mod, pitch as pitch_mod
from lightningfastspeech2_tpu.audio import snr as snr_mod
from lightningfastspeech2_tpu.core.bucketing import Bucketer, pad_batch, round_up
from lightningfastspeech2_tpu.core.config import AudioConfig
from lightningfastspeech2_tpu.data import wav as wav_io
from lightningfastspeech2_tpu.data.alignment import tier_to_alignment
from lightningfastspeech2_tpu.data.textgrid import load as load_textgrid
from lightningfastspeech2_tpu.data.vocab import SILENCE, Vocab, normalize_phone


@dataclass(frozen=True)
class DataConfig:
    """Dataset knobs (reference ``datasets.py:48-128`` defaults)."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    min_length: float = 0.5   # seconds (datasets.py:83)
    max_length: float = 32.0  # seconds (datasets.py:84)
    variances: Tuple[str, ...] = ("pitch", "energy", "snr")
    variance_levels: Tuple[str, ...] = ("frame", "frame", "frame")
    variance_transforms: Tuple[str, ...] = ("none", "none", "none")
    priors: Tuple[str, ...] = ()
    augment_duration: float = 0.1
    speaker_type: str = "dvector"
    min_samples_per_speaker: int = 0
    stat_entries: int = 10_000
    stat_batch: int = 4
    seed: int = 42
    source_phoneset: str = "arpabet"
    load_wav: bool = False
    # raw mode: skip ALL host-side feature extraction; items carry only
    # phones/durations/wav/silence masks, features are computed on-device
    # inside the train step (train/on_device_features.py)
    raw_mode: bool = False
    max_phones: int = 512
    max_frames: int = 2816
    # process-parallel corpus scan (reference process_map(_create_entry),
    # datasets.py:133-140); 0 = serial
    scan_workers: int = 0
    # collated-mel dtype for the host->device transfer. "bfloat16" halves
    # the dominant batch payload (mel is ~90% of the bytes) — on a
    # remote/tunneled TPU the input transfer IS the training-loop
    # bottleneck once the step itself is fast (measured round 4:
    # 2.8 MB T=512 batch ≈ 35-55 ms at ~35 MB/s tunnel bandwidth vs a
    # ~12 ms device step). Loss math still runs at the model's compute
    # dtype; only the target's storage rounding changes (bf16 mel target
    # rounding is far below the mel-L1 losses being optimized). The train
    # CLI defaults this to bfloat16 whenever --precision bf16.
    mel_dtype: str = "float32"
    # waveform transfer dtype when load_wav/raw_mode ships audio: "int16"
    # quarters the wav payload vs float32 (the source files ARE 16-bit;
    # only the load-time peak-norm scaling makes re-quantization lossy, at
    # <1/65536). Consumers dequantize on device (data/wav.py:dequantize).
    # The joint FastDiff batch at B=16, T=512 ships 8.4 MB of float32 wav
    # per step — ~240 ms at tunnel bandwidth — so this matters more than
    # the mel shrink for joint training.
    wav_dtype: str = "float32"


@dataclass
class Entry:
    utt_id: str
    audio_path: Path
    phones: List[str]
    durations: np.ndarray
    start: float
    end: float
    speaker: str
    text: str = ""


def _scan_worker_init():
    """Scan workers are fresh spawn interpreters; pin any lazy JAX init in
    the import chain to the CPU backend (same rationale as data/loader.py:
    a child touching the TPU runtime would deadlock or fight the parent)."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")


def _scan_one(tg_path: Path, cfg: DataConfig, root: Path) -> Optional[Entry]:
    """Parse one TextGrid into an Entry, or None if filtered/unusable
    (reference ``_create_entry``, datasets.py:692-742)."""
    sr, hop = cfg.audio.sampling_rate, cfg.audio.hop_length
    wav_path = tg_path.with_suffix(".wav")
    if not wav_path.exists():
        return None
    try:
        tg = load_textgrid(tg_path)
        tier = tg.tier("phones")
    except (ValueError, KeyError):
        return None
    phones, durations, start, end = tier_to_alignment(tier, sr, hop)
    if not phones:
        return None
    length = end - start
    if length < cfg.min_length or length > cfg.max_length:
        return None
    phones = [normalize_phone(p, cfg.source_phoneset) for p in phones]
    if len(phones) > cfg.max_phones:
        return None
    rel = tg_path.relative_to(root)
    speaker = rel.parts[0] if len(rel.parts) > 1 else "speaker0"
    text = ""
    try:
        words = tg.tier("words")
        text = " ".join(iv.text for iv in words.intervals if iv.text)
    except KeyError:
        pass
    return Entry(
        utt_id=tg_path.stem,
        audio_path=wav_path,
        phones=phones,
        durations=np.asarray(durations, dtype=np.int64),
        start=start,
        end=end,
        speaker=speaker,
        text=text,
    )


def _cpu_device():
    import jax

    return jax.local_devices(backend="cpu")[0]


def _stats_item_moments(
    item: Dict[str, Any], cfg: "DataConfig"
) -> Dict[str, Tuple[float, float, float, float, float]]:
    """Reduce one extracted item to per-key (count, sum, sumsq, min, max)
    over its finite values — the sufficient statistics for
    ``_create_stats``' min/max/mean/population-std."""
    out: Dict[str, Tuple[float, float, float, float, float]] = {}

    def add(key: str, vals) -> None:
        vals = np.asarray(vals, np.float64).ravel()
        vals = vals[np.isfinite(vals)]
        if vals.size:
            out[key] = (float(vals.size), float(vals.sum()),
                        float((vals * vals).sum()),
                        float(vals.min()), float(vals.max()))

    for i, var in enumerate(cfg.variances):
        if cfg.variance_transforms[i] == "cwt":
            with np.errstate(divide="ignore"):
                vals = np.log(item[f"variances_{var}_signal"])
        else:
            vals = item[f"variances_{var}"]
        add(var, vals)
    add("mel", item["mel"])
    add("duration", item["duration"])
    for var in cfg.priors:
        add(f"priors_{var}", [float(item[f"priors_{var}"])])
    return out


_STATS_DS = None


def _stats_worker_init(payload: bytes) -> None:
    # CPU backend only: workers must never touch the (possibly remote) TPU
    import os
    import pickle

    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    global _STATS_DS
    _STATS_DS = pickle.loads(payload)


def _stats_worker_item(idx: int):
    item = _STATS_DS.__getitem__(idx, augment=False)
    return _stats_item_moments(item, _STATS_DS.cfg)


@functools.lru_cache(maxsize=64)
def _extract_fn(wav_len: int, sr: int, n_fft: int, win: int, hop: int,
                n_mels: int, fmin: float, fmax: float,
                want_pitch: bool, want_snr: bool):
    """Jitted per-wav-bucket feature extractor on the host CPU backend."""
    import jax
    import jax.numpy as jnp

    cfg = AudioConfig(sampling_rate=sr, n_fft=n_fft, win_length=win,
                      hop_length=hop, n_mels=n_mels, f_min=fmin, f_max=fmax)

    def extract(wav):
        out = {
            "mel": mel_mod.mel_spectrogram(wav, cfg),
            "energy": features.frame_energy(wav, hop, win),
        }
        if want_pitch:
            out["pitch"] = pitch_mod.track(wav, sr, hop, win)
        if want_snr:
            out["snr"] = snr_mod.windowed_wada(wav, hop, win)
        return out

    return jax.jit(extract)


class TTSDataset:
    """Map-style dataset over a corpus directory of paired
    ``<utt>.wav`` + ``<utt>.TextGrid`` files (speaker = first-level
    subdirectory, LibriTTS layout)."""

    def __init__(
        self,
        root: Optional[Path] = None,
        cfg: DataConfig = DataConfig(),
        entries: Optional[List[Entry]] = None,
        vocab: Optional[Vocab] = None,
        stats: Optional[Dict[str, Dict[str, float]]] = None,
        speaker2dvector: Optional[Dict[str, np.ndarray]] = None,
        compute_stats: bool = True,
        cache_dir: Optional[Path] = None,
    ):
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        if entries is None:
            assert root is not None
            entries = self.scan(Path(root), cfg)
        if cfg.min_samples_per_speaker > 0:
            counts: Dict[str, int] = {}
            for e in entries:
                counts[e.speaker] = counts.get(e.speaker, 0) + 1
            entries = [
                e for e in entries if counts[e.speaker] >= cfg.min_samples_per_speaker
            ]
        # fixed-seed shuffle (datasets.py:143)
        order = np.random.default_rng(cfg.seed).permutation(len(entries))
        self.entries = [entries[i] for i in order]

        self.vocab = vocab or Vocab(
            p for e in self.entries for p in e.phones
        )
        self.speakers = sorted({e.speaker for e in self.entries})
        self.speaker2id = {s: i for i, s in enumerate(self.speakers)}
        self.speaker2dvector = dict(speaker2dvector or {})
        if "dvector" in cfg.speaker_type:
            # materialize the full table (real d-vectors come from
            # data/dvector.py; deterministic hash placeholders otherwise)
            for s in self.speakers:
                if s not in self.speaker2dvector:
                    self.speaker2dvector[s] = _hash_dvector(s)
        self.speaker2priors: Dict[str, Dict[str, np.ndarray]] = {}

        # per-utterance feature cache (reference pre-computes features to
        # disk at dataset build, datasets.py; without this every epoch
        # re-runs the full front-end — at ~0.15 s/utt that dominates a
        # multi-epoch run): stats WRITE it, training epochs READ it
        self.feature_cache_dir = (
            Path(cache_dir) / "features" if cache_dir is not None else None
        )

        self.stats = stats
        if self.stats is None and compute_stats:
            if cache_dir is not None and self.load_cache(cache_dir):
                pass  # stats + vocab restored from cache
            else:
                self.stats = self._create_stats()
                if cache_dir is not None:
                    self.save_cache(cache_dir)

    # ------------------------------------------------------------ scanning
    @staticmethod
    def scan(root: Path, cfg: DataConfig) -> List[Entry]:
        """Parse every aligned (TextGrid, wav) pair under ``root`` into
        Entries. With ``cfg.scan_workers > 1`` the parse fans out over a
        spawn-based process pool (reference ``process_map(_create_entry)``,
        datasets.py:133-140) with deterministic, path-sorted output order.
        """
        paths = sorted(root.rglob("*.TextGrid"))
        if cfg.scan_workers > 1 and len(paths) >= 4 * cfg.scan_workers:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            chunk = -(-len(paths) // (cfg.scan_workers * 4))
            with ProcessPoolExecutor(
                max_workers=cfg.scan_workers,
                mp_context=mp.get_context("spawn"),
                initializer=_scan_worker_init,
            ) as pool:
                results = pool.map(
                    functools.partial(_scan_one, cfg=cfg, root=root),
                    paths, chunksize=chunk,
                )
                return [e for e in results if e is not None]
        return [e for p in paths if (e := _scan_one(p, cfg, root)) is not None]

    def __len__(self) -> int:
        return len(self.entries)

    # ------------------------------------------------------------- getitem
    def _load_audio(self, entry: Entry) -> np.ndarray:
        sr = self.cfg.audio.sampling_rate
        wav, in_sr = wav_io.read(entry.audio_path)
        wav = wav_io.resample(wav, in_sr, sr)
        start = int(sr * entry.start)
        end = int(sr * entry.end)
        wav = wav[start:end]
        peak = np.max(np.abs(wav)) if len(wav) else 1.0
        return (wav / max(peak, 1e-9)).astype(np.float32)

    def _extract(self, wav: np.ndarray) -> Dict[str, np.ndarray]:
        a = self.cfg.audio
        # pad wav to a bucket so the jitted extractor compiles once/bucket
        bucket = round_up(max(len(wav), a.hop_length), a.hop_length * 256)
        padded = np.zeros(bucket, dtype=np.float32)
        padded[: len(wav)] = wav
        fn = _extract_fn(
            bucket, a.sampling_rate, a.n_fft, a.win_length, a.hop_length,
            a.n_mels, a.f_min, a.f_max,
            "pitch" in self.cfg.variances, "snr" in self.cfg.variances,
        )
        import jax

        # host-side extraction stays on the CPU backend even when the
        # default device is a (possibly remote) TPU
        with jax.default_device(_cpu_device()):
            out = {k: np.asarray(v) for k, v in fn(padded).items()}
        n_frames = 1 + len(wav) // a.hop_length
        return {k: v[:n_frames] for k, v in out.items()}

    def _cached(self, name: str, entry: Entry, key_parts, compute):
        """Disk-cache one utterance's derived arrays (atomic writes, safe
        under concurrent loader/stats workers). Returns dict of arrays."""
        cdir = self.feature_cache_dir
        if cdir is None:
            return compute()
        key = hashlib.md5(
            json.dumps(list(key_parts), default=str).encode()
        ).hexdigest()[:16]
        path = cdir / f"{entry.utt_id}-{name}-{key}.npz"
        if path.exists():
            try:
                with np.load(path) as z:
                    return {k: z[k] for k in z.files}
            except Exception:
                pass  # torn/corrupt file: recompute and rewrite
        out = compute()
        import os as _os

        cdir.mkdir(parents=True, exist_ok=True)
        tmp = cdir / f".{entry.utt_id}-{name}-{key}.{_os.getpid()}.npz"
        np.savez(tmp, **out)
        _os.replace(tmp, path)
        return out

    def _features(self, entry: Entry, wav: np.ndarray) -> Dict[str, np.ndarray]:
        a = self.cfg.audio
        return self._cached(
            "feats", entry,
            (entry.utt_id, len(wav), a.sampling_rate, a.n_fft, a.win_length,
             a.hop_length, a.n_mels, a.f_min, a.f_max,
             "pitch" in self.cfg.variances, "snr" in self.cfg.variances),
            lambda: self._extract(wav),
        )

    def __getitem__(self, idx: int, augment: bool = True) -> Dict[str, Any]:
        entry = self.entries[idx]
        cfg = self.cfg
        wav = self._load_audio(entry)

        if cfg.raw_mode:
            durations = entry.durations.copy()
            if augment and cfg.augment_duration > 0:
                durations = features.augment_durations(
                    durations, self.rng, cfg.augment_duration
                )
            phone_ids = np.asarray(self.vocab.encode(entry.phones), np.int64)
            silence_phone = np.asarray(
                [p.startswith("[") for p in entry.phones], dtype=bool
            )
            item: Dict[str, Any] = {
                "id": entry.utt_id,
                "phones": phone_ids,
                "duration": durations.astype(np.int64),
                "silence_phone": silence_phone,
                "wav": wav,
                "text": entry.text,
                "speaker_key": entry.speaker,
            }
            if cfg.speaker_type == "dvector":
                dvec = self.speaker2dvector.get(entry.speaker)
                item["speaker"] = (
                    dvec if dvec is not None else _hash_dvector(entry.speaker)
                ).astype(np.float32)
            elif cfg.speaker_type == "id":
                item["speaker"] = np.int64(self.speaker2id[entry.speaker])
            return item

        feats = self._features(entry, wav)

        durations = entry.durations.copy()
        if augment and cfg.augment_duration > 0:
            durations = features.augment_durations(
                durations, self.rng, cfg.augment_duration
            )
        dur_sum = int(durations.sum())

        phone_ids = np.asarray(self.vocab.encode(entry.phones), dtype=np.int64)
        unexpanded_silence = np.asarray(
            [p.startswith("[") for p in entry.phones], dtype=bool
        )
        silence_mask = features.expand_by_duration(unexpanded_silence, durations)

        mel = feats["mel"][:dur_sum]

        variances: Dict[str, Any] = {}
        for i, var in enumerate(cfg.variances):
            if var == "srmr":

                def _compute_srmr():
                    from lightningfastspeech2_tpu.audio.srmr import frame_srmr

                    import jax as _jax

                    # host-side like the other features: SRMR's Hilbert
                    # envelope FFTs run at the raw wav length, and on TPU
                    # an odd-length FFT lowers to a full (N, N) DFT
                    # matmul — an 18 GB allocation for a 3 s utterance
                    with _jax.default_device(_cpu_device()):
                        return {"srmr": frame_srmr(
                            wav, dur_sum, cfg.audio.sampling_rate)}

                # dur_sum (the interp grid) is augmentation-stable: the
                # duration jitter preserves the total (features.py)
                sig = self._cached(
                    "srmr", entry,
                    (entry.utt_id, len(wav), int(dur_sum),
                     cfg.audio.sampling_rate),
                    _compute_srmr,
                )["srmr"]
            else:
                sig = feats[var][:dur_sum].astype(np.float64).copy()
            sm = silence_mask[: len(sig)]
            if var == "pitch":
                sig[sig == 0] = np.nan
                sig[sm] = np.nan
                if np.isnan(sig).all():
                    sig[:] = 1e-7
                sig = features.interpolate_nans(sig)
            elif var == "snr":
                sig[sm] = np.nan
                if np.isnan(sig).all():
                    sig = np.zeros_like(sig)
                else:
                    sig = features.interpolate_nans(sig)
            if cfg.variance_levels[i] == "phone":
                sig = features.phone_average(sig, durations)
            transform = cfg.variance_transforms[i]
            if transform == "cwt":
                variances[var] = cwt_mod.decompose_np(sig)
            elif transform == "log":
                variances[var] = np.log(np.maximum(sig, 1e-10))
            elif self.stats is not None:
                st = self.stats[var]
                variances[var] = (sig - st["mean"]) / st["std"]
            else:
                variances[var] = sig

        priors: Dict[str, float] = {}
        for var in cfg.priors:
            if var == "duration":
                priors[var] = float(np.mean(durations[~unexpanded_silence]))
                continue
            i = cfg.variances.index(var)
            val = variances[var]
            if isinstance(val, dict):
                val = val["original_signal"]
            mean = std = None
            if self.stats is not None and var in self.stats:
                mean, std = self.stats[var]["mean"], self.stats[var]["std"]
            else:
                mean, std = 0.0, 1.0
            if cfg.variance_levels[i] == "phone":
                sel = val[~unexpanded_silence[: len(val)]]
            else:
                sel = val[~silence_mask[: len(val)]]
            if len(sel) == 0:
                sel = val
            priors[var] = float(np.mean(sel * std + mean))

        item: Dict[str, Any] = {
            "id": entry.utt_id,
            "phones": phone_ids,
            "duration": durations.astype(np.int64),
            "mel": mel.astype(np.float32),
            "silence_mask": silence_mask,
            "unexpanded_silence_mask": unexpanded_silence,
            "text": entry.text,
            "speaker_key": entry.speaker,
        }
        for var, val in variances.items():
            if isinstance(val, dict):
                item[f"variances_{var}_signal"] = np.exp(val["signal"]).astype(
                    np.float32
                )
                item[f"variances_{var}_spectrogram"] = val["spectrogram"].astype(
                    np.float32
                )
                item[f"variances_{var}_mean"] = np.float32(val["mean"])
                item[f"variances_{var}_std"] = np.float32(val["std"])
            else:
                item[f"variances_{var}"] = val.astype(np.float32)
        for var, val in priors.items():
            item[f"priors_{var}"] = np.float32(val)

        if cfg.speaker_type == "dvector":
            dvec = self.speaker2dvector.get(entry.speaker)
            if dvec is None:
                dvec = _hash_dvector(entry.speaker)
            item["speaker"] = dvec.astype(np.float32)
            # per-utterance d-vector for the diffusion speaker generator
            # (datasets.py:469: utterance_dvec from <utt>.npy)
            utt_path = entry.audio_path.with_suffix(".npy")
            if utt_path.exists():
                item["utterance_dvec"] = np.load(utt_path).astype(np.float32)
        elif cfg.speaker_type == "dvector_utterance":
            utt_path = entry.audio_path.with_suffix(".npy")
            if utt_path.exists():
                item["speaker"] = np.load(utt_path).astype(np.float32)
            else:
                item["speaker"] = _hash_dvector(entry.utt_id)
        elif cfg.speaker_type == "id":
            item["speaker"] = np.int64(self.speaker2id[entry.speaker])

        if cfg.load_wav:
            item["wav"] = wav
        return item

    # --------------------------------------------------------------- stats
    def _create_stats(self) -> Dict[str, Dict[str, float]]:
        """Streaming corpus statistics over the first ``stat_entries`` items
        (reference ``datasets.py:214-304,744-794``).

        Each item reduces to per-key (count, sum, sumsq, min, max)
        moments — exact min/max/mean/population-std of the concatenated
        finite values, including the prior scalars in the SAME pass (an
        earlier version re-extracted every item a second time for
        priors). With ``cfg.scan_workers > 1`` items fan out over a spawn
        pool: stats are the dominant dataset-init cost (full feature
        extraction per item — ~0.15 s/utt means hours serial on a
        LibriTTS-scale corpus, the reference's training corpus)."""
        if self.cfg.raw_mode:
            # stats always need full extraction; temporarily leave raw mode
            import dataclasses

            full_cfg = dataclasses.replace(self.cfg, raw_mode=False)
            saved, self.cfg = self.cfg, full_cfg
            try:
                return self._create_stats()
            finally:
                self.cfg = saved
        n = min(len(self.entries), self.cfg.stat_entries)
        acc: Dict[str, Tuple[float, float, float, float, float]] = {}

        def merge(moments: Dict[str, Tuple]) -> None:
            for key, (cnt, s, ss, mn, mx) in moments.items():
                if key in acc:
                    N, S, SS, MN, MX = acc[key]
                    acc[key] = (N + cnt, S + s, SS + ss,
                                min(MN, mn), max(MX, mx))
                else:
                    acc[key] = (cnt, s, ss, mn, mx)

        if self.cfg.scan_workers > 1 and n >= 4 * self.cfg.scan_workers:
            import pickle
            from concurrent.futures import ProcessPoolExecutor
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            payload = pickle.dumps(self)
            with ProcessPoolExecutor(
                max_workers=self.cfg.scan_workers,
                mp_context=ctx,
                initializer=_stats_worker_init,
                initargs=(payload,),
            ) as pool:
                chunk = max(1, -(-n // (self.cfg.scan_workers * 8)))
                for moments in pool.map(_stats_worker_item, range(n),
                                        chunksize=chunk):
                    merge(moments)
        else:
            for idx in range(n):
                item = self.__getitem__(idx, augment=False)
                merge(_stats_item_moments(item, self.cfg))

        stats: Dict[str, Dict[str, float]] = {}
        for key, (cnt, s, ss, mn, mx) in acc.items():
            mean = s / cnt
            var = max(ss / cnt - mean * mean, 0.0)
            stats[key] = {
                "min": float(mn),
                "max": float(mx),
                "mean": float(mean),
                "std": float(max(np.sqrt(var), 1e-7)),
            }
        return stats

    def create_validation_dataset(self, root: Path) -> "TTSDataset":
        """Validation split sharing vocab + stats (datasets.py:315).

        ``min_samples_per_speaker`` is a TRAIN-split filter (the CLI flag
        is --train_min_samples_per_speaker) and must not apply here: a
        typical held-out split has a handful of utterances per speaker,
        and inheriting the filter silently emptied the eval set."""
        import dataclasses

        entries = self.scan(Path(root), self.cfg)
        cfg = dataclasses.replace(self.cfg, min_samples_per_speaker=0)
        return TTSDataset(
            cfg=cfg, entries=entries, vocab=self.vocab, stats=self.stats,
            speaker2dvector=self.speaker2dvector, compute_stats=False,
        )

    def create_dvectors(self, pipeline=None, cache: bool = True):
        """Embed every utterance with the d-vector net and build the
        speaker table (reference ``_create_dvectors``,
        datasets.py:652-690: 1 s per utterance -> ``<utt>.npy``, speaker
        vector = mean over utterances -> ``speaker.npy``).

        ``pipeline``: a ``data.dvector.DVectorPipeline`` (pass converted
        pretrained weights for real speaker discrimination; the default
        random-init LSTM still yields deterministic utterance-dependent
        embeddings). Returns the speaker table.
        """
        from lightningfastspeech2_tpu.data.dvector import DVectorPipeline

        if pipeline is None:
            pipeline = DVectorPipeline(
                sampling_rate=self.cfg.audio.sampling_rate
            )
        speaker_means = pipeline.process_entries(self.entries, cache=cache)
        self.speaker2dvector.update(speaker_means)
        if cache:
            # per-speaker mean beside the audio (datasets.py:686-688)
            for e in self.entries:
                spk_path = Path(e.audio_path).parent / "speaker.npy"
                if e.speaker in speaker_means and not spk_path.exists():
                    np.save(spk_path, speaker_means[e.speaker])
        return self.speaker2dvector

    def get_speaker_dvectors(self):
        """Yield ``(speaker, (n_utts, dim) array)`` of per-utterance
        d-vectors from the ``<utt>.npy`` caches that ``create_dvectors``
        writes beside the audio (reference ``get_speaker_dvectors``,
        datasets.py:546-551). Speakers with no cached vectors are skipped.
        """
        per_speaker: Dict[str, List[np.ndarray]] = {}
        for e in self.entries:
            dvec_path = Path(e.audio_path).with_suffix(".npy")
            if dvec_path.exists():
                per_speaker.setdefault(e.speaker, []).append(
                    np.load(dvec_path)
                )
        for spk, vecs in per_speaker.items():
            yield spk, np.stack(vecs)

    def create_priors(self) -> Dict[str, Dict[str, np.ndarray]]:
        """Per-speaker arrays of utterance priors
        (reference ``_create_priors``, datasets.py:476-544)."""
        per_speaker: Dict[str, Dict[str, List[float]]] = {}
        for idx in range(len(self.entries)):
            item = self.__getitem__(idx, augment=False)
            spk = item["speaker_key"]
            for var in self.cfg.priors:
                per_speaker.setdefault(spk, {}).setdefault(var, []).append(
                    float(item[f"priors_{var}"])
                )
        self.speaker2priors = {
            spk: {var: np.asarray(vals) for var, vals in d.items()}
            for spk, d in per_speaker.items()
        }
        return self.speaker2priors

    # --------------------------------------------------------------- cache
    def cache_key(self) -> str:
        """Fingerprint of (config, file list, mtimes) for the scan/stats
        cache (the reference md5-pickles whole datasets, train.py:139-217;
        here only derived metadata is cached, never code objects)."""
        import dataclasses

        cfg_dict = dataclasses.asdict(self.cfg)
        # machine-dependent performance knobs must not invalidate the
        # cache — they cannot change the derived data
        cfg_dict.pop("scan_workers", None)
        h = hashlib.md5()
        h.update(json.dumps(cfg_dict, sort_keys=True,
                            default=str).encode())
        for e in sorted(self.entries, key=lambda e: e.utt_id):
            h.update(e.utt_id.encode())
            try:
                h.update(str(e.audio_path.stat().st_mtime_ns).encode())
            except OSError:
                pass
        return h.hexdigest()

    def save_cache(self, cache_dir) -> Path:
        path = Path(cache_dir)
        path.mkdir(parents=True, exist_ok=True)
        out = path / f"stats_{self.cache_key()}.json"
        out.write_text(json.dumps({
            "stats": self.stats,
            "phone2id": self.vocab.to_dict(),
        }))
        return out

    def load_cache(self, cache_dir) -> bool:
        """Restore stats/vocab if a matching cache exists; returns hit."""
        path = Path(cache_dir) / f"stats_{self.cache_key()}.json"
        if not path.exists():
            return False
        data = json.loads(path.read_text())
        self.stats = data["stats"]
        self.vocab = Vocab.from_dict(data["phone2id"])
        return True

    def shard_across_hosts(self) -> "TTSDataset":
        """Multi-host input sharding: each host keeps a strided slice of
        the (already seed-shuffled) entries. Vocab and stats stay global
        so every host builds identical models (SURVEY.md §2.8 host-sharded
        input pipeline)."""
        import jax

        n, i = jax.process_count(), jax.process_index()
        if n == 1:
            return self
        self.entries = self.entries[i::n]
        return self

    # -------------------------------------------------------------- batching
    def sort_by_duration(self) -> None:
        """Length-sorted order for low-padding bucketed batching
        (datasets.py:884-886)."""
        self.entries.sort(key=lambda e: int(e.durations.sum()))

    def collate(self, items: Sequence[Dict[str, Any]],
                bucketer: Optional[Bucketer] = None) -> Dict[str, np.ndarray]:
        return collate(items, self.cfg, bucketer)


def _hash_dvector(speaker: str, dim: int = 256) -> np.ndarray:
    """Deterministic placeholder d-vector when no table is loaded (real
    d-vectors come from data/dvector.py)."""
    seed = int(hashlib.md5(speaker.encode()).hexdigest()[:8], 16)
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def collate(
    items: Sequence[Dict[str, Any]],
    cfg: DataConfig,
    bucketer: Optional[Bucketer] = None,
) -> Dict[str, np.ndarray]:
    """Static-shape collation (reference ``_collate_fn``
    ``datasets.py:852-882``, made uniform): pad phones/frames to the batch
    bucket, attach ``*_lengths``."""
    bucketer = bucketer or Bucketer(cfg.max_phones, cfg.max_frames)
    P = bucketer.phone_bucket(max(len(i["phones"]) for i in items))

    if cfg.raw_mode:
        T = bucketer.frame_bucket(max(int(i["duration"].sum()) for i in items))
        batch = {
            "phones": pad_batch([i["phones"] for i in items], P),
            "duration": pad_batch([i["duration"] for i in items], P),
            "silence_phone": pad_batch(
                [i["silence_phone"] for i in items], P
            ),
            "wav": pad_batch([i["wav"] for i in items],
                             T * cfg.audio.hop_length),
            "phones_lengths": np.asarray([len(i["phones"]) for i in items]),
        }
        if cfg.speaker_type != "none":
            batch["speaker"] = np.stack([i["speaker"] for i in items])
        return _shrink_transfer(batch, cfg)

    T = bucketer.frame_bucket(max(i["mel"].shape[0] for i in items))

    batch: Dict[str, np.ndarray] = {
        "phones": pad_batch([i["phones"] for i in items], P),
        "duration": pad_batch([i["duration"] for i in items], P),
        "mel": pad_batch([i["mel"] for i in items], T),
        "phones_lengths": np.asarray([len(i["phones"]) for i in items]),
        "mel_lengths": np.asarray([i["mel"].shape[0] for i in items]),
        # silence masks pad with 1 (datasets.py:866-870)
        "silence_mask": pad_batch(
            [i["silence_mask"] for i in items], T, value=1
        ),
    }
    for i_var, var in enumerate(cfg.variances):
        L = P if cfg.variance_levels[i_var] == "phone" else T
        if cfg.variance_transforms[i_var] == "cwt":
            batch[f"variances_{var}_signal"] = pad_batch(
                [i[f"variances_{var}_signal"] for i in items], L
            )
            batch[f"variances_{var}_spectrogram"] = pad_batch(
                [i[f"variances_{var}_spectrogram"] for i in items], L
            )
            batch[f"variances_{var}_mean"] = np.asarray(
                [i[f"variances_{var}_mean"] for i in items]
            )
            batch[f"variances_{var}_std"] = np.asarray(
                [i[f"variances_{var}_std"] for i in items]
            )
        else:
            batch[f"variances_{var}"] = pad_batch(
                [i[f"variances_{var}"] for i in items], L
            )
    for var in cfg.priors:
        batch[f"priors_{var}"] = np.asarray([i[f"priors_{var}"] for i in items])
    if cfg.speaker_type != "none":
        batch["speaker"] = np.stack([i["speaker"] for i in items])
        if all("utterance_dvec" in i for i in items):
            batch["utterance_dvec"] = np.stack(
                [i["utterance_dvec"] for i in items]
            )
    if cfg.load_wav and "wav" in items[0]:
        wav_len = T * cfg.audio.hop_length
        batch["wav"] = pad_batch([i["wav"] for i in items], wav_len)
    return _shrink_transfer(batch, cfg)


def _shrink_transfer(batch: Dict[str, np.ndarray],
                     cfg: DataConfig) -> Dict[str, np.ndarray]:
    """Minimize host->device bytes: int64 index arrays become int32 (jax
    x64 is off — the device would truncate them anyway, so shipping 8-byte
    ints pays double IPC + transfer for nothing) and the mel target drops
    to ``cfg.mel_dtype`` when configured (see DataConfig.mel_dtype)."""
    for k, v in batch.items():
        if v.dtype == np.int64:
            batch[k] = v.astype(np.int32)
    if cfg.mel_dtype != "float32" and "mel" in batch:
        import ml_dtypes

        batch["mel"] = batch["mel"].astype(ml_dtypes.bfloat16)
    if cfg.wav_dtype == "int16" and "wav" in batch:
        batch["wav"] = np.clip(
            batch["wav"] * 32768.0, -32768, 32767
        ).astype(np.int16)
    return batch
