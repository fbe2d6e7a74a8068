"""CLI round-trip: train a tiny model on the synthetic corpus, checkpoint,
then synthesize a sentence and re-synthesize the dataset from it."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.data.synthetic import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("corpus"), n_speakers=2,
                       n_utts=3, seed=3)


def test_train_and_generate_cli(corpus, tmp_path):
    from lightningfastspeech2_tpu.cli import generate as gen_cli
    from lightningfastspeech2_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpts"
    train_cli.main([
        "--train_target_path", str(corpus),
        "--checkpoint_dir", str(ckpt_dir),
        "--log_dir", str(tmp_path / "logs"),
        "--max_steps", "3",
        "--batch_size", "2",
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
        "--variance_filter_size", "32",
        "--duration_filter_size", "32",
        "--stat_entries", "4",
        "--augment_duration", "0",
        "--precision", "32",
        "--checkpoint_every", "100",
        "--log_every", "1",
    ])
    assert (ckpt_dir / "latest").exists()

    out_dir = tmp_path / "gen"
    gen_cli.main([
        "--checkpoint_dir", str(ckpt_dir),
        "--output_path", str(out_dir),
        "--sentence", "hello world.",
        # pin G2P to rule LTS: the shipped lexicon/neural-G2P defaults
        # emit real English phones outside the tiny synthetic vocab
        "--lexicon_path", "none", "--g2p_model", "none",
        "--no_vocoder",
    ])
    assert (out_dir / "sentence.wav").exists()

    resynth_dir = tmp_path / "resynth"
    gen_cli.main([
        "--checkpoint_dir", str(ckpt_dir),
        "--output_path", str(resynth_dir),
        "--dataset", str(corpus),
        "--hours", "0.0001",
        "--no_vocoder",
    ])
    wavs = list(resynth_dir.rglob("*.wav"))
    assert wavs, "no re-synthesized wavs written"
    assert list(resynth_dir.rglob("*.meta"))


def test_warm_start_resume(corpus, tmp_path):
    """--from_checkpoint restores params (tolerant) and continues."""
    from lightningfastspeech2_tpu.cli import train as train_cli

    common = [
        "--train_target_path", str(corpus),
        "--log_dir", str(tmp_path / "logs2"),
        "--batch_size", "2",
        "--variances", "energy", "--variance_levels", "frame",
        "--variance_transforms", "none", "--variance_nlayers", "2",
        "--encoder_hidden", "32", "--decoder_hidden", "32",
        "--encoder_layers", "2", "--decoder_layers", "2",
        "--encoder_kernel_sizes", "3", "5",
        "--decoder_kernel_sizes", "5", "3",
        "--encoder_conv_filter_size", "64",
        "--decoder_conv_filter_size", "64",
        "--variance_filter_size", "32", "--duration_filter_size", "32",
        "--stat_entries", "2", "--augment_duration", "0",
        "--precision", "32", "--checkpoint_every", "100",
        "--log_every", "1",
    ]
    ckpt1 = tmp_path / "ck1"
    train_cli.main(common + ["--checkpoint_dir", str(ckpt1),
                             "--max_steps", "2"])
    ckpt2 = tmp_path / "ck2"
    train_cli.main(common + ["--checkpoint_dir", str(ckpt2),
                             "--max_steps", "2",
                             "--from_checkpoint", str(ckpt1)])
    assert (ckpt2 / "latest").exists()


def test_trained_vocoder_dir_keeps_speaker_tables(corpus, tmp_path):
    """Regression (round 5): with --hifigan_checkpoint pointing at a
    cli.train_vocoder directory, load_generator's vocoder branch used to
    clobber the ACOUSTIC checkpoint's sidecar local — sentence mode lost
    every speaker/prior table (random-speaker selection crashed on an
    empty list, named speakers failed lookups). The tables must survive
    and sentence mode must run end-to-end through the trained vocoder."""
    from lightningfastspeech2_tpu.cli import generate as gen_cli
    from lightningfastspeech2_tpu.cli import train as train_cli
    from lightningfastspeech2_tpu.cli import train_vocoder as voc_cli

    ckpt_dir = tmp_path / "ckpts"
    train_cli.main([
        "--train_target_path", str(corpus),
        "--checkpoint_dir", str(ckpt_dir),
        "--log_dir", str(tmp_path / "logs"),
        "--max_steps", "2", "--batch_size", "2",
        "--variances", "pitch",
        "--variance_levels", "phone",
        "--variance_transforms", "none",
        "--variance_nlayers", "2",
        "--encoder_hidden", "32", "--decoder_hidden", "32",
        "--encoder_layers", "1", "--decoder_layers", "1",
        "--encoder_kernel_sizes", "3", "--decoder_kernel_sizes", "3",
        "--encoder_conv_filter_size", "64",
        "--decoder_conv_filter_size", "64",
        "--variance_filter_size", "32", "--duration_filter_size", "32",
        "--stat_entries", "4", "--augment_duration", "0",
        "--precision", "32", "--checkpoint_every", "100",
        "--log_every", "1",
        "--speaker_type", "dvector",
    ])

    voc_ckpt = tmp_path / "voc_ckpts"
    voc_cli.main([
        "--train_target_path", str(corpus),
        "--checkpoint_dir", str(voc_ckpt),
        "--log_dir", str(tmp_path / "voc_logs"),
        "--max_steps", "2", "--checkpoint_every", "1", "--log_every", "1",
        "--upsample_rates", "8", "2",
        "--upsample_kernel_sizes", "16", "4",
        "--upsample_initial_channel", "16",
        "--resblock_kernel_sizes", "3",
        "--segment_size", "1024", "--batch_size", "2",
    ])

    args = gen_cli.build_parser().parse_args([
        "--checkpoint_dir", str(ckpt_dir),
        "--hifigan_checkpoint", str(voc_ckpt),
        "--lexicon_path", "none", "--g2p_model", "none",
    ])
    gen, _, sidecar = gen_cli.load_generator(args)
    assert gen.speaker2dvector, "vocoder sidecar clobbered speaker tables"
    assert sidecar.get("speaker2dvector"), "acoustic sidecar lost"

    out = tmp_path / "out"
    gen_cli.main([
        "--checkpoint_dir", str(ckpt_dir),
        "--hifigan_checkpoint", str(voc_ckpt),
        "--output_path", str(out),
        "--sentence", "hello.",
        "--lexicon_path", "none", "--g2p_model", "none",
    ])
    assert (out / "sentence.wav").exists()
