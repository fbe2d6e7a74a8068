"""G2P, LogGMM, checkpointing, and end-to-end text->wav generation."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.data.vocab import SILENCE
from lightningfastspeech2_tpu.synthesis.g2p import EnglishG2P, letter_to_sound
from lightningfastspeech2_tpu.utils.log_gmm import LogGMM, fit_speaker_gmms


def test_g2p_punctuation_and_silence():
    g2p = EnglishG2P()
    phones = g2p("hello world.")
    assert phones[-1] == "[FULL STOP]"
    assert SILENCE in phones
    assert all(isinstance(p, str) and p for p in phones)


def test_g2p_lexicon_priority(tmp_path):
    lex = tmp_path / "lex.tsv"
    lex.write_text("zzz\tHH AH0 L OW1\n")
    g2p = EnglishG2P(str(lex))
    phones = g2p("zzz")
    assert phones[:4] == ["h", "ʌ", "l", "oʊ"]


def test_letter_to_sound_basics():
    assert letter_to_sound("sing") == ["S", "IH0", "NG"]
    assert letter_to_sound("check")[0] == "CH"


def test_log_gmm_roundtrip():
    g = np.random.default_rng(0)
    X = np.exp(g.standard_normal((200, 2))) * np.array([100.0, 5.0])
    gmm = LogGMM(n_components=2, logs=[0, 1], random_state=0)
    gmm.fit(X)
    samples, _ = gmm.sample(500, random_state=1)
    assert samples.shape == (500, 2)
    # samples land in the data's support (log-space fit keeps positivity)
    assert (samples > 0).mean() > 0.99
    assert 0.2 < np.median(samples[:, 0]) / np.median(X[:, 0]) < 5.0


def test_fit_speaker_gmms_bic_selection():
    g = np.random.default_rng(1)
    speaker2priors = {
        "spk0": {"pitch": np.abs(g.standard_normal(60)) + 100,
                 "duration": np.abs(g.standard_normal(60)) + 5},
    }
    gmms = fit_speaker_gmms(speaker2priors, ("pitch", "duration"),
                            max_components=3, min_samples_per_component=20)
    assert "spk0" in gmms
    assert gmms["spk0"].gmm.n_components <= 3


def test_checkpoint_save_restore(tmp_path):
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer, warm_start
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2, make_dummy_batch,
    )
    from lightningfastspeech2_tpu.train.step import create_train_state
    from tests.test_model import tiny_config

    cfg = tiny_config()
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 2, 8).items()}
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)

    ck = Checkpointer(tmp_path / "ckpt")
    sidecar = {
        "stats": {"pitch": {"min": 50.0, "max": 400.0, "mean": 180.0, "std": 40.0}},
        "phone2id": {"[PAD]": 0, "a": 1},
        "speaker2dvector": {"spk0": np.ones(16, np.float32)},
        "speaker2priors": {"spk0": {"pitch": np.arange(3.0)}},
    }
    ck.save(5, state, cfg, sidecar)

    tree, cfg2, side2 = ck.restore()
    assert int(tree["step"]) == int(state.step)
    assert cfg2.model.max_phones == cfg.model.max_phones
    assert side2["phone2id"]["a"] == 1
    np.testing.assert_allclose(side2["speaker2dvector"]["spk0"], np.ones(16))
    np.testing.assert_allclose(side2["speaker2priors"]["spk0"]["pitch"],
                               np.arange(3.0))
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(tree["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # warm start drops mismatched shapes
    cfg_big = C.replace(cfg, **{"model.vocab_size": 99})
    model_big = FastSpeech2(cfg_big.model)
    params_big = model_big.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        batch, deterministic=True,
    )
    merged, used, dropped = warm_start(params_big, {"params": tree["params"]})
    assert used > 0 and dropped > 0


def test_generate_from_text_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.data.vocab import Vocab
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2, init_params, make_dummy_batch,
    )
    from lightningfastspeech2_tpu.synthesis.generator import SpeechGenerator
    from lightningfastspeech2_tpu.vocoder import hifigan as hg
    from tests.test_model import tiny_config

    cfg = tiny_config()
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 2, 8).items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)["params"]

    g2p = EnglishG2P()
    phones = sorted(set(g2p("hello world this is a test.")))
    vocab = Vocab(phones)
    # tiny hifigan so the test stays fast
    vcfg = hg.HifiGanConfig(
        upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), num_mels=80,
    )
    synth = hg.Synthesiser(vcfg)

    gen = SpeechGenerator(
        cfg, model, params, vocab, g2p, synthesiser=synth,
        speaker2dvector={"spk0": np.zeros(16, np.float32)},
    )
    wav = gen.generate_from_text("hello world.", speaker="spk0", seed=0)
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()
    out = tmp_path / "out.wav"
    gen.save_audio(out, wav)
    assert out.exists()


def test_bucketed_serving_matches_full_bucket():
    """Frame-bucketed serving (duration pass -> per-bucket program) must
    produce the same audio as the full-max_frames program: durations are
    re-predicted bit-identically in pass 2 (same params/rng), and masked
    positions are zeroed before every conv/attention, so a smaller static
    T changes only padding, never valid frames."""
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.core.bucketing import Bucketer
    from lightningfastspeech2_tpu.data.vocab import Vocab
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2, init_params, make_dummy_batch,
    )
    from lightningfastspeech2_tpu.synthesis.generator import SpeechGenerator
    from tests.test_model import tiny_config

    cfg = tiny_config(max_frames=128)
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 1, 8).items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)["params"]

    g2p = EnglishG2P()
    phones = sorted(set(g2p("hello world this is a test.")))
    vocab = Vocab(phones)
    gen = SpeechGenerator(
        cfg, model, params, vocab, g2p,
        speaker2dvector={"spk0": np.zeros(16, np.float32)},
    )
    # fine frame buckets so an untrained model's short predictions land in
    # a bucket well below max_frames (the default 256-step ladder would
    # collapse to one bucket at this tiny max_frames)
    gen.bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames,
                            frame_step=16)

    ids = gen.text_to_ids("hello world.")
    P = gen.bucketer.phone_bucket(len(ids))
    from lightningfastspeech2_tpu.core.bucketing import pad_to

    b = {"phones": pad_to(ids, P)[None, :],
         "speaker": np.zeros((1, 16), np.float32)}

    # duration pass alone agrees with the full program's durations
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    rng = jax.random.PRNGKey(0)
    d_pass = gen._dur_infer(gen.params, jb, rng)
    full = gen._infer(gen.params, jb, rng)
    np.testing.assert_array_equal(
        np.asarray(d_pass["duration_rounded"]),
        np.asarray(full["duration_rounded"]),
    )

    gen.frame_bucketing = True
    wav_bucketed = gen.generate_samples(b)[0]
    assert gen._bucket_infer, "bucketed path not exercised (bucket==max?)"
    gen.frame_bucketing = False
    wav_full = gen.generate_samples(b)[0]
    assert wav_bucketed.shape == wav_full.shape
    # different static T changes XLA reduction/fusion tiling, so outputs
    # differ by float32 accumulation order (~1e-4), never semantics
    np.testing.assert_allclose(wav_bucketed, wav_full, rtol=2e-3, atol=2e-3)
    err = np.linalg.norm(wav_bucketed - wav_full)
    snr = 20 * np.log10(np.linalg.norm(wav_full) / max(err, 1e-12))
    assert snr > 55.0, f"bucketed-vs-full SNR {snr:.1f} dB"


def test_vocoder_bucketing_static_shapes_and_trim(monkeypatch):
    """Round 5: the vocoder must see the STATIC bucket-length mel (padded
    frames at the log-mel silence floor) and the returned wav must be
    trimmed to n_valid_frames*hop — per-utterance-length vocoder inputs
    recompiled the vocoder for every distinct length (measured >10 min of
    tunnel compiles in the serving-path bench)."""
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.data.vocab import Vocab
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2, init_params, make_dummy_batch,
    )
    from lightningfastspeech2_tpu.synthesis.generator import SpeechGenerator
    from tests.test_model import tiny_config

    cfg = tiny_config(max_frames=128)
    hop = cfg.model.audio.hop_length
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 1, 8).items()}
    params = init_params(model, jax.random.PRNGKey(0), batch)["params"]

    g2p = EnglishG2P()
    vocab = Vocab(sorted(set(g2p("hello world."))))

    seen = []

    def fake_synth(mel):
        seen.append(np.asarray(mel).shape)
        return np.zeros(len(mel) * hop, np.float32)

    gen = SpeechGenerator(
        cfg, model, params, vocab, g2p, synthesiser=fake_synth,
        speaker2dvector={"spk0": np.zeros(16, np.float32)},
    )
    assert gen.vocoder_bucketing  # default on
    wav = gen.generate_from_text("hello world.", speaker="spk0", seed=0)
    # the vocoder saw a full static-bucket mel ...
    (shape,) = seen
    assert shape[0] in gen.bucketer.frame_buckets or \
        shape[0] == cfg.model.max_frames
    # ... and the output was trimmed to the valid frames
    assert len(wav) % hop == 0 and len(wav) <= shape[0] * hop

    # opt-out restores exact-length vocoding
    seen.clear()
    gen.vocoder_bucketing = False
    wav2 = gen.generate_from_text("hello world.", speaker="spk0", seed=0)
    (shape2,) = seen
    assert shape2[0] * hop == len(wav2) * 32768 // 32768  # exact length
    assert shape2[0] <= shape[0]
