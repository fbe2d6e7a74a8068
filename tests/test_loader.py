"""Multiprocess prefetch loader: batch parity with the synchronous
iterator, liveness, and clean shutdown."""

import numpy as np

from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
from lightningfastspeech2_tpu.data.loader import PrefetchLoader, batch_index_stream
from lightningfastspeech2_tpu.data.synthetic import make_corpus
from lightningfastspeech2_tpu.train.loop import batch_iterator


def _dataset(tmp_path, raw=False, n_utts=8):
    corpus = make_corpus(tmp_path / "c", n_speakers=2, n_utts=n_utts, seed=3)
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, raw_mode=raw,
        max_phones=32, max_frames=256,
    )
    return TTSDataset(root=corpus, cfg=dcfg)


def test_index_stream_batches_cover_epoch():
    batches = list(batch_index_stream(10, 4, shuffle=True, seed=0, epochs=2))
    assert len(batches) == 4  # floor(10/4) per epoch
    for b in batches:
        assert len(b) == 4


def test_index_stream_sorted_batches_are_length_local():
    lengths = np.asarray([9, 1, 5, 3, 7, 2, 8, 4])
    batches = list(batch_index_stream(8, 2, shuffle=True, seed=1, epochs=1,
                                      lengths=lengths))
    for b in batches:
        # each batch spans adjacent ranks of the sorted order
        ranks = sorted(np.argsort(lengths).tolist().index(i) for i in b)
        assert ranks[1] - ranks[0] == 1


def test_prefetch_loader_matches_synchronous_iterator(tmp_path):
    ds = _dataset(tmp_path)
    serial = list(batch_iterator(ds, 4, shuffle=True, seed=7, epochs=2))
    with PrefetchLoader(ds, 4, shuffle=True, seed=7, epochs=2,
                        num_workers=2, prefetch=3) as loader:
        parallel = list(loader)
    assert len(serial) == len(parallel) == 2 * (len(ds) // 4)
    for sb, pb in zip(serial, parallel):
        assert sorted(sb.keys()) == sorted(pb.keys())
        for k in sb:
            if isinstance(sb[k], np.ndarray):
                np.testing.assert_allclose(sb[k], pb[k], atol=1e-6, err_msg=k)


def test_prefetch_loader_raw_mode(tmp_path):
    ds = _dataset(tmp_path, raw=True)
    with PrefetchLoader(ds, 4, shuffle=False, epochs=1,
                        num_workers=2) as loader:
        batches = list(loader)
    assert len(batches) == len(ds) // 4
    assert "wav" in batches[0] and "mel" not in batches[0]


def test_fit_with_prefetch_workers(tmp_path):
    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.train.loop import fit
    from tests.test_end_to_end import small_train_config

    ds = _dataset(tmp_path)
    cfg = C.replace(small_train_config(), **{"train.num_workers": 2,
                                             "train.prefetch": 2})
    result = fit(cfg, ds, max_steps=3)
    assert np.isfinite(result.history[-1]["total"])
