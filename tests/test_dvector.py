"""d-vector pipeline: wav2mel front-end, LSTM encoder, torch conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lightningfastspeech2_tpu.data import dvector as dv


def test_wav2mel_shapes():
    g = np.random.default_rng(0)
    wav = g.standard_normal(22050).astype(np.float32)  # 1 s at 22.05 kHz
    mel = dv.wav2mel(wav, 22050)
    # ~1 s at 16 kHz, 10 ms hop -> ~100 frames (minus removed silence)
    assert mel.ndim == 2 and mel.shape[1] == 40
    assert 50 <= mel.shape[0] <= 110
    assert np.isfinite(mel).all()


def test_normalize_db():
    wav = np.array([0.1, -0.5, 0.25], np.float32)
    out = dv.normalize_db(wav, -3.0)
    np.testing.assert_allclose(np.abs(out).max(), 10 ** (-3 / 20), rtol=1e-6)


def test_remove_silence_drops_long_gaps():
    sr = 16000
    loud = np.ones(sr // 2, np.float32)
    gap = np.zeros(sr, np.float32)  # 1 s silence > 0.1 s threshold
    wav = np.concatenate([loud, gap, loud])
    out = dv.remove_silence(wav, sr)
    assert len(out) < len(wav) - sr // 2  # most of the gap removed
    short_gap = np.zeros(int(0.05 * sr), np.float32)  # kept
    wav2 = np.concatenate([loud, short_gap, loud])
    assert len(dv.remove_silence(wav2, sr)) == len(wav2)


def test_dvector_embedding_properties():
    model = dv.DVector(dim_cell=32, dim_emb=16)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 60, 40)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)
    emb = model.apply(params, mel)
    assert emb.shape == (1, 16)
    np.testing.assert_allclose(float(jnp.linalg.norm(emb[0])), 1.0, rtol=1e-5)


def test_lstm_conversion_matches_torch():
    """Single-layer sanity: flax LSTM with converted torch weights matches
    torch.nn.LSTM outputs."""
    torch.manual_seed(0)
    tl = torch.nn.LSTM(8, 16, num_layers=3, batch_first=True)
    state = {f"lstm.{k}": v.detach().numpy()
             for k, v in tl.state_dict().items()}
    # reuse the converter's per-layer mapping
    fake_state = dict(state)
    fake_state["embedding.weight"] = np.zeros((16, 16), np.float32)
    fake_state["embedding.bias"] = np.zeros(16, np.float32)
    variables = dv.convert_torch_state_dict(fake_state)

    x = np.random.default_rng(2).standard_normal((1, 12, 8)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x))

    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i in range(3):
                h = dv.LSTMLayer(16, name=f"lstm{i}")(h)
            return h

    sub = {"params": {k: v for k, v in variables["params"].items()
                      if k.startswith("lstm")}}
    sub = jax.tree_util.tree_map(jnp.asarray, sub)
    ours = Stack().apply(sub, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_pipeline_on_synthetic_corpus(tmp_path):
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from lightningfastspeech2_tpu.data.synthetic import make_corpus

    corpus = make_corpus(tmp_path / "c", n_speakers=2, n_utts=2, seed=5)
    cfg = DataConfig(augment_duration=0.0, stat_entries=1,
                     max_phones=64, max_frames=512)
    entries = TTSDataset.scan(corpus, cfg)
    pipeline = dv.DVectorPipeline(rng=jax.random.PRNGKey(0))
    speaker_means = pipeline.process_entries(entries)
    assert set(speaker_means) == {"spk0", "spk1"}
    for vec in speaker_means.values():
        assert vec.shape == (256,)
        assert np.isfinite(vec).all()
    # cached npy files written next to the audio
    assert list(corpus.rglob("*.npy"))
