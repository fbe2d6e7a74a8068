"""Eval media artifacts: evaluate() writes pred/true spectrogram pngs (and
vocoded wavs when a vocoder is supplied) under media_dir (reference logs
these to wandb every eval, fastspeech2.py:809-957,998-1011)."""

import numpy as np

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
from lightningfastspeech2_tpu.data.synthetic import make_corpus
from lightningfastspeech2_tpu.train.loop import build_model, evaluate, fit
from tests.test_end_to_end import small_train_config


def test_evaluate_writes_media(tmp_path):
    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=4, seed=13)
    dcfg = DataConfig(
        variances=("pitch", "energy"), variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"), augment_duration=0.0,
        speaker_type="dvector", stat_entries=4,
        max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    result = fit(cfg, ds, max_steps=1)
    model = build_model(cfg, ds)

    media = tmp_path / "media"
    fake_vocoder = lambda mel: np.zeros(mel.shape[0] * 256, np.float32)
    metrics = evaluate(cfg, ds, model, result.state.params, max_batches=1,
                       media_dir=media, step=7, vocoder=fake_vocoder,
                       max_examples=2)
    assert "eval/mel_loss" in metrics
    out = media / "step_00000007"
    assert (out / "0_pred.png").exists()
    assert (out / "0_true.png").exists()
    assert (out / "0_pred.wav").exists()
    assert (out / "1_pred.png").exists()
