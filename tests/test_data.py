"""Data layer tests: TextGrid parsing, alignment semantics, synthetic-corpus
dataset pipeline, stats, and static-shape collation."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.core.bucketing import Bucketer
from lightningfastspeech2_tpu.core.config import AudioConfig
from lightningfastspeech2_tpu.data import textgrid as tg_mod
from lightningfastspeech2_tpu.data.alignment import tier_to_alignment
from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset, collate
from lightningfastspeech2_tpu.data.synthetic import make_corpus
from lightningfastspeech2_tpu.data.vocab import SILENCE, Vocab, normalize_phone


def test_textgrid_roundtrip(tmp_path):
    tg = tg_mod.TextGrid(
        0.0, 1.0,
        (
            tg_mod.Tier("words", (tg_mod.Interval(0.0, 1.0, 'he said "hi"'),)),
            tg_mod.Tier(
                "phones",
                (
                    tg_mod.Interval(0.0, 0.4, "HH"),
                    tg_mod.Interval(0.4, 1.0, "AY1"),
                ),
            ),
        ),
    )
    path = tmp_path / "x.TextGrid"
    path.write_text(tg_mod.dump(tg))
    parsed = tg_mod.load(path)
    assert parsed.tier("phones").intervals[1].text == "AY1"
    assert parsed.tier("words").intervals[0].text == 'he said "hi"'
    assert parsed.xmax == 1.0


def test_alignment_silence_handling():
    sr, hop = 22050, 256
    tier = tg_mod.Tier(
        "phones",
        (
            tg_mod.Interval(0.0, 0.5, "sil"),    # leading silence trimmed
            tg_mod.Interval(0.5, 0.7, "AA1"),
            tg_mod.Interval(0.7, 0.8, "sp"),     # mid silence kept
            tg_mod.Interval(0.9, 1.1, "IY0"),    # gap 0.8-0.9 -> extra sil
            tg_mod.Interval(1.1, 1.5, ""),       # trailing silence trimmed
        ),
    )
    phones, durations, start, end = tier_to_alignment(tier, sr, hop)
    assert phones == ["AA1", "sil", "sil", "IY0"]
    # reference semantics (audio_utils.py:66-89): end_time tracks EVERY
    # interval including the trailing silence, whose frames get folded into
    # the last real phone by the rounding repair
    assert start == 0.5 and end == 1.5
    assert sum(durations) == int(np.ceil(((1.5 - 0.5) * sr - 1) / hop))


def test_vocab_and_phone_normalization():
    assert normalize_phone("sil") == SILENCE
    assert normalize_phone("AA1") == "ɑ"
    assert normalize_phone("CH0") == "tʃ"
    v = Vocab(["ɑ", "tʃ", SILENCE])
    assert v.phone2id["[PAD]"] == 0
    assert v.decode(v.encode(["ɑ", SILENCE])) == ["ɑ", SILENCE]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_corpus(root, n_speakers=2, n_utts=3, seed=0)


@pytest.fixture(scope="module")
def dataset(corpus):
    cfg = DataConfig(
        variances=("pitch", "energy", "snr"),
        variance_levels=("frame", "frame", "frame"),
        variance_transforms=("none", "none", "none"),
        priors=("pitch", "duration"),
        augment_duration=0.0,
        speaker_type="dvector",
        stat_entries=4,
        max_phones=64,
        max_frames=512,
    )
    return TTSDataset(root=corpus, cfg=cfg)


def test_dataset_scan_and_vocab(dataset):
    assert len(dataset) == 6
    assert len(dataset.vocab) > 3
    assert len(dataset.speakers) == 2


def test_dataset_item_consistency(dataset):
    item = dataset[0]
    dur_sum = int(item["duration"].sum())
    assert item["mel"].shape == (dur_sum, 80)
    assert np.isfinite(item["mel"]).all()
    for var in ("pitch", "energy", "snr"):
        assert item[f"variances_{var}"].shape[0] == dur_sum
        assert np.isfinite(item[f"variances_{var}"]).all()
    assert item["silence_mask"].shape[0] == dur_sum
    assert np.isfinite(item["priors_pitch"])
    assert item["speaker"].shape == (256,)
    # z-normalized variances should be roughly centered
    assert abs(item["variances_energy"].mean()) < 5.0


def test_dataset_stats(dataset):
    stats = dataset.stats
    for key in ("pitch", "energy", "snr", "mel", "duration", "priors_pitch"):
        assert key in stats
        s = stats[key]
        assert s["min"] <= s["mean"] <= s["max"]
        assert s["std"] > 0
    # pitch stats should be in plausible Hz range for the synthetic vowels
    assert 50 < stats["pitch"]["mean"] < 400


def test_collate_static_shapes(dataset):
    items = [dataset[i] for i in range(4)]
    batch = dataset.collate(items, Bucketer(max_phones=64, max_frames=512,
                                            phone_step=16, frame_step=128))
    P, T = batch["phones"].shape[1], batch["mel"].shape[1]
    assert P % 16 == 0 and T % 128 == 0
    assert batch["mel"].shape == (4, T, 80)
    assert batch["duration"].shape == (4, P)
    assert batch["variances_pitch"].shape == (4, T)
    assert batch["speaker"].shape == (4, 256)
    # padding is zeros for phones
    for b, n in enumerate(batch["phones_lengths"]):
        assert (batch["phones"][b, n:] == 0).all()


def test_validation_dataset_shares_stats(dataset, corpus):
    valid = dataset.create_validation_dataset(corpus)
    assert valid.stats is dataset.stats
    assert valid.vocab.phone2id == dataset.vocab.phone2id


def test_priors_per_speaker(dataset):
    priors = dataset.create_priors()
    assert set(priors) == set(dataset.speakers)
    for spk, d in priors.items():
        assert set(d) == {"pitch", "duration"}
        assert len(d["pitch"]) == 3


def test_stats_cache_roundtrip(corpus, tmp_path):
    cfg = DataConfig(
        variances=("energy",), variance_levels=("frame",),
        variance_transforms=("none",), augment_duration=0.0,
        stat_entries=2, max_phones=64, max_frames=512,
    )
    ds1 = TTSDataset(root=corpus, cfg=cfg, cache_dir=tmp_path)
    assert list(tmp_path.glob("stats_*.json"))
    ds2 = TTSDataset(root=corpus, cfg=cfg, cache_dir=tmp_path)
    assert ds2.stats == ds1.stats
    assert ds2.vocab.phone2id == ds1.vocab.phone2id
    # different config -> different key, no false hit
    cfg3 = DataConfig(
        variances=("energy",), variance_levels=("frame",),
        variance_transforms=("none",), augment_duration=0.0,
        stat_entries=1, max_phones=64, max_frames=512,
    )
    ds3 = TTSDataset(root=corpus, cfg=cfg3, cache_dir=tmp_path)
    assert len(list(tmp_path.glob("stats_*.json"))) == 2


def test_parallel_scan_matches_serial(tmp_path):
    from dataclasses import replace

    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset

    root = make_corpus(tmp_path / "corpus", n_speakers=2, n_utts=6, seed=3)
    cfg = DataConfig(stat_entries=0)
    serial = TTSDataset.scan(root, replace(cfg, scan_workers=0))
    parallel = TTSDataset.scan(root, replace(cfg, scan_workers=2))
    assert len(serial) == len(parallel) > 0
    for a, b in zip(serial, parallel):
        assert a.utt_id == b.utt_id and a.speaker == b.speaker
        assert a.phones == b.phones and a.text == b.text
        np.testing.assert_array_equal(a.durations, b.durations)
        assert (a.start, a.end, a.audio_path) == (b.start, b.end, b.audio_path)


def test_cache_key_ignores_scan_workers(tmp_path):
    from dataclasses import replace

    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset

    root = make_corpus(tmp_path / "corpus", n_speakers=1, n_utts=3, seed=11)
    ds1 = TTSDataset(root=root, cfg=DataConfig(stat_entries=0, scan_workers=0))
    ds2 = TTSDataset(root=root, cfg=DataConfig(stat_entries=0, scan_workers=8))
    assert ds1.cache_key() == ds2.cache_key()


def test_parallel_stats_match_serial(corpus):
    """_create_stats with scan_workers>1 fans items over a spawn pool;
    the merged moments must reproduce the serial stats exactly (same
    finite-value min/max/mean/population-std, priors included)."""
    import dataclasses

    cfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"),
        priors=("pitch", "duration"),
        augment_duration=0.0,
        stat_entries=8,
        max_phones=64,
        max_frames=512,
        scan_workers=0,
    )
    serial = TTSDataset(root=corpus, cfg=cfg).stats
    par_cfg = dataclasses.replace(cfg, scan_workers=2)
    parallel = TTSDataset(root=corpus, cfg=par_cfg).stats
    assert set(serial) == set(parallel)
    for key in serial:
        for stat in ("min", "max", "mean", "std"):
            assert abs(serial[key][stat] - parallel[key][stat]) <= 1e-9, (
                key, stat, serial[key], parallel[key])


def test_feature_cache_roundtrip(corpus, tmp_path):
    """Per-utterance feature caching: second dataset (same cache dir)
    reproduces items bit-exactly without re-extracting."""
    cfg = DataConfig(
        variances=("pitch", "energy", "snr"),
        variance_levels=("frame",) * 3,
        variance_transforms=("none",) * 3,
        augment_duration=0.0,
        stat_entries=2,
        max_phones=64,
        max_frames=512,
    )
    ds1 = TTSDataset(root=corpus, cfg=cfg, cache_dir=tmp_path)
    item1 = ds1[0]
    feat_files = list((tmp_path / "features").glob("*.npz"))
    assert feat_files, "feature cache not written"
    ds2 = TTSDataset(root=corpus, cfg=cfg, cache_dir=tmp_path)
    # poison _extract: a cache hit must not call it
    ds2._extract = None
    item2 = ds2[0]
    for k in ("mel", "variances_pitch", "variances_energy", "variances_snr"):
        np.testing.assert_array_equal(item1[k], item2[k])


def test_collate_transfer_shrink_int16_wav_and_bf16_mel(tmp_path):
    """The transfer-shrink encodings (DataConfig.mel_dtype/wav_dtype) must
    round-trip: int16 wav dequantizes to within 1/32768 of the float
    original, bf16 mel to within bf16 rounding; index arrays ship int32."""
    import ml_dtypes
    import numpy as np

    from lightningfastspeech2_tpu.data.dataset import DataConfig, collate
    from lightningfastspeech2_tpu.data.wav import dequantize

    cfg = DataConfig(raw_mode=True, speaker_type="none",
                     mel_dtype="bfloat16", wav_dtype="int16")
    rng = np.random.default_rng(0)
    items = []
    for i in range(2):
        n_ph = 4 + i
        dur = rng.integers(1, 4, n_ph)
        items.append({
            "id": f"u{i}",
            "phones": np.arange(1, n_ph + 1, dtype=np.int64),
            "duration": dur.astype(np.int64),
            "silence_phone": np.zeros(n_ph, bool),
            "wav": rng.uniform(-0.9, 0.9,
                               int(dur.sum()) * 256).astype(np.float32),
        })
    batch = collate(items, cfg)
    assert batch["phones"].dtype == np.int32
    assert batch["duration"].dtype == np.int32
    assert batch["wav"].dtype == np.int16
    deq = np.asarray(dequantize(batch["wav"]))
    n = len(items[0]["wav"])
    np.testing.assert_allclose(deq[0, :n], items[0]["wav"], atol=1 / 32768)

    # non-raw path: bf16 mel
    cfg2 = DataConfig(speaker_type="none", mel_dtype="bfloat16",
                      variances=(), variance_levels=(),
                      variance_transforms=())
    items2 = []
    for i in range(2):
        n_ph = 3
        dur = rng.integers(1, 4, n_ph)
        T = int(dur.sum())
        items2.append({
            "id": f"v{i}",
            "phones": np.arange(1, n_ph + 1, dtype=np.int64),
            "duration": dur.astype(np.int64),
            "silence_mask": np.zeros(T, bool),
            "mel": rng.standard_normal((T, 80)).astype(np.float32),
        })
    b2 = collate(items2, cfg2)
    assert b2["mel"].dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(
        b2["mel"][0, : items2[0]["mel"].shape[0]].astype(np.float32),
        items2[0]["mel"], rtol=1e-2, atol=1e-2,
    )
