"""FastDiff CLI surface: joint vocoder training via the train CLI and
FastDiff N-step synthesis via the generate CLI (reference
litfass/train.py:73-91, generate.py:37-38,163-171, scripts/train.sh:44-47)."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.data.synthetic import make_corpus


TINY = [
    "--batch_size", "2",
    "--variances", "pitch", "energy",
    "--variance_levels", "frame", "frame",
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
    "--log_every", "1",
    "--num_workers", "0",
]

FASTDIFF_TINY = [
    "--fastdiff_vocoder", "true",
    "--fastdiff_inner_channels", "4",
    "--fastdiff_lvc_layers", "1",
    "--fastdiff_kpnet_hidden", "4",
    "--fastdiff_diffusion_T", "50",
    "--fastdiff_schedule", "0.0", "1.0",
    "--fastdiff_schedule_end", "2",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("corpus"), n_speakers=1,
                       n_utts=3, seed=11)


def test_fastdiff_joint_train_and_generate_cli(corpus, tmp_path):
    from lightningfastspeech2_tpu.cli import generate as gen_cli
    from lightningfastspeech2_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpts"
    result = train_cli.main([
        "--train_target_path", str(corpus),
        "--checkpoint_dir", str(ckpt_dir),
        "--log_dir", str(tmp_path / "logs"),
        "--max_steps", "3",
        "--checkpoint_every", "100",
        *TINY, *FASTDIFF_TINY,
    ])
    # the joint loss ran: a finite fastdiff epsilon-MSE term every step
    last = result.history[-1]
    assert "fastdiff" in last and np.isfinite(last["fastdiff"]), last
    assert (ckpt_dir / "latest").exists()
    # joint checkpoints carry both subtrees
    assert "acoustic" in result.state.params
    assert "fastdiff" in result.state.params

    out_dir = tmp_path / "gen"
    gen_cli.main([
        "--checkpoint_dir", str(ckpt_dir),
        "--output_path", str(out_dir),
        "--sentence", "hello world.",
        # pin G2P to rule LTS: the shipped lexicon/neural-G2P defaults
        # emit real English phones outside the tiny synthetic vocab
        "--lexicon_path", "none", "--g2p_model", "none",
        "--use_fastdiff", "true",
        "--fastdiff_n", "3",
    ])
    wav_path = out_dir / "sentence.wav"
    assert wav_path.exists()
    from lightningfastspeech2_tpu.data import wav as wav_io

    wav, sr = wav_io.read(wav_path)
    assert sr == 22050 and len(wav) > 0 and np.isfinite(wav).all()


def test_schedule_probability_drives_training(corpus, tmp_path):
    """The epoch-indexed schedule is threaded into the jitted step as a
    traced scalar (no per-epoch retrace)."""
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.cli.train import args_to_config, build_parser
    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from lightningfastspeech2_tpu.models.joint import schedule_probability
    from lightningfastspeech2_tpu.train.loop import fit

    args = build_parser().parse_args([
        "--train_target_path", str(corpus), *TINY, *FASTDIFF_TINY,
    ])
    cfg = args_to_config(args)
    assert cfg.model.fastdiff_vocoder
    assert schedule_probability(cfg.model, 0) == 0.0
    assert schedule_probability(cfg.model, 1) == 1.0

    dcfg = DataConfig(
        variances=("pitch", "energy"), variance_levels=("frame", "frame"),
        variance_transforms=("none", "none"), augment_duration=0.0,
        speaker_type="dvector", stat_entries=4, load_wav=True,
        max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    small = C.replace(cfg, **{
        "model.max_phones": 32, "model.max_frames": 256,
        "train.eval_every": 1000, "train.checkpoint_every": 1000,
    })
    result = fit(small, ds, max_steps=2)
    assert np.isfinite(result.history[-1]["total"])
    assert np.isfinite(result.history[-1]["fastdiff"])
