"""Real d-vector wiring end-to-end (VERDICT r1 missing #2): the train CLI
embeds every utterance with data/dvector.py — no hash placeholders — and
persists the table in the checkpoint sidecar (reference
datasets.py:652-690)."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.data.dataset import (
    DataConfig,
    TTSDataset,
    _hash_dvector,
)
from lightningfastspeech2_tpu.data.synthetic import make_corpus


@pytest.fixture()
def corpus(tmp_path):
    return make_corpus(tmp_path / "corpus", n_speakers=2, n_utts=3, seed=7)


def test_create_dvectors_builds_real_table(corpus):
    dcfg = DataConfig(
        variances=("pitch", "energy"), variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"), augment_duration=0.0,
        speaker_type="dvector", stat_entries=2,
        max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    # before: placeholder table
    for spk in ds.speakers:
        np.testing.assert_array_equal(ds.speaker2dvector[spk],
                                      _hash_dvector(spk))
    table = ds.create_dvectors()
    for spk in ds.speakers:
        assert not np.allclose(table[spk], _hash_dvector(spk))
        assert table[spk].shape == (256,)
        assert np.isfinite(table[spk]).all()
    # per-utterance + per-speaker caches beside the audio
    for e in ds.entries:
        assert e.audio_path.with_suffix(".npy").exists()
        assert (e.audio_path.parent / "speaker.npy").exists()
    # items now carry the real vector + the utterance d-vector
    item = ds[0]
    np.testing.assert_allclose(item["speaker"],
                               table[item["speaker_key"]].astype(np.float32))
    assert "utterance_dvec" in item
    # cached second pass is consistent
    table2 = TTSDataset(root=corpus, cfg=dcfg, compute_stats=False)
    table2 = table2.create_dvectors()
    for spk in table:
        np.testing.assert_allclose(table[spk], table2[spk], atol=1e-6)


def test_fit_dvector_gmms_and_sampling():
    """Per-speaker GMMs over utterance d-vectors, component count clamped
    to the sample count (reference fastspeech2.py:492-499)."""
    from lightningfastspeech2_tpu.utils.log_gmm import fit_dvector_gmms

    rng = np.random.default_rng(0)
    speakers = {
        "a": rng.standard_normal((4, 16)) + 2.0,
        "b": rng.standard_normal((30, 16)) - 2.0,
    }
    gmms = fit_dvector_gmms(speakers.items())
    assert set(gmms) == {"a", "b"}
    assert gmms["a"].gmm.n_components == 4   # clamped (only 4 utts)
    assert gmms["b"].gmm.n_components == 10  # reference default
    for spk, X in speakers.items():
        sample, _ = gmms[spk].sample(5, random_state=1)
        assert sample.shape == (5, 16)
        assert np.isfinite(sample).all()
        # samples land near the speaker's cloud, not the other one's
        assert np.abs(np.mean(sample) - np.mean(X)) < 1.5


def test_generator_samples_novel_dvector():
    """SpeechGenerator._pick_speaker draws from the d-vector GMM when
    asked (generate.py:216-217 analog) and differs from the table mean."""
    from lightningfastspeech2_tpu.utils.log_gmm import fit_dvector_gmms

    rng = np.random.default_rng(1)
    X = rng.standard_normal((20, 8)) + 1.0
    gmms = fit_dvector_gmms([("spk", X)])

    gen = object.__new__(
        __import__(
            "lightningfastspeech2_tpu.synthesis.generator",
            fromlist=["SpeechGenerator"],
        ).SpeechGenerator
    )

    class _MCfg:
        speaker_type = "dvector"
        priors = ()

    class _Cfg:
        model = _MCfg()

    gen.cfg = _Cfg()
    gen.speaker2dvector = {"spk": np.mean(X, axis=0)}
    gen.speaker2priors = {}
    gen.dvector_gmms = gmms
    name, vec = gen._pick_speaker("spk", np.random.default_rng(2),
                                  sample_dvector=True)
    assert name == "spk"
    assert vec.shape == (8,)
    assert not np.allclose(vec, gen.speaker2dvector["spk"])
    # without sampling: the table mean
    _, mean_vec = gen._pick_speaker("spk", np.random.default_rng(2))
    np.testing.assert_allclose(mean_vec, gen.speaker2dvector["spk"],
                               rtol=1e-6)


def test_train_cli_uses_computed_dvectors(corpus, tmp_path):
    from lightningfastspeech2_tpu.cli import train as train_cli
    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer

    ckpt_dir = tmp_path / "ckpts"
    train_cli.main([
        "--train_target_path", str(corpus),
        "--checkpoint_dir", str(ckpt_dir),
        "--log_dir", str(tmp_path / "logs"),
        "--max_steps", "2", "--batch_size", "2",
        "--variances", "pitch", "energy",
        "--variance_levels", "phone", "frame",
        "--variance_transforms", "none", "none",
        "--variance_nlayers", "2", "2",
        "--encoder_hidden", "32", "--decoder_hidden", "32",
        "--encoder_layers", "2", "--decoder_layers", "2",
        "--encoder_kernel_sizes", "3", "5",
        "--decoder_kernel_sizes", "5", "3",
        "--encoder_conv_filter_size", "64",
        "--decoder_conv_filter_size", "64",
        "--variance_filter_size", "32", "--duration_filter_size", "32",
        "--stat_entries", "2", "--augment_duration", "0",
        "--precision", "32", "--checkpoint_every", "100",
        "--log_every", "1", "--num_workers", "0",
        "--speaker_type", "dvector",
    ])
    _, _, sidecar = Checkpointer(str(ckpt_dir)).restore()
    table = sidecar["speaker2dvector"]
    assert len(table) == 2
    for spk, vec in table.items():
        assert not np.allclose(np.asarray(vec), _hash_dvector(spk)), (
            f"speaker {spk} fell back to the hash placeholder"
        )
