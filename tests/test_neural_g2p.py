"""In-framework neural G2P (the offline analog of the reference's g2p_en
OOV fallback, litfass/synthesis/g2p.py:4): trains on a CMUdict-style
lexicon, generalizes to held-out words, persists, and plugs into
EnglishG2P's OOV path."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.synthesis.neural_g2p import (
    NeuralG2P,
    train_neural_g2p,
)

# a consistent letter-to-phone language: the model must learn the mapping
# and apply it to unseen words (held out below)
_MAP = {
    "b": "B", "d": "D", "f": "F", "g": "G", "k": "K", "l": "L",
    "m": "M", "n": "N", "p": "P", "r": "R", "s": "S", "t": "T",
    "a": "AA1", "e": "EH1", "i": "IY1", "o": "OW1", "u": "UW1",
}


def _make_lexicon(n_words: int, seed: int):
    rng = np.random.default_rng(seed)
    letters = list(_MAP)
    lex = {}
    while len(lex) < n_words:
        n = int(rng.integers(3, 9))
        word = "".join(rng.choice(letters, size=n))
        lex[word] = [_MAP[c] for c in word]
    return lex


@pytest.fixture(scope="module")
def trained():
    lex = _make_lexicon(2000, seed=0)
    words = sorted(lex)
    held_out = words[:60]
    train_lex = {w: lex[w] for w in words[60:]}
    model = train_neural_g2p(train_lex, steps=1000, batch_size=64, d=48,
                             seed=0)
    return model, train_lex, {w: lex[w] for w in held_out}


def test_learns_training_set(trained):
    model, train_lex, _ = trained
    words = sorted(train_lex)[:50]
    preds = model(words)
    acc = np.mean([p == train_lex[w] for w, p in zip(words, preds)])
    assert acc > 0.9, f"train accuracy {acc}"


def test_generalizes_to_held_out(trained):
    model, _, held = trained
    words = sorted(held)
    preds = model(words)
    acc = np.mean([p == held[w] for w, p in zip(words, preds)])
    assert acc > 0.8, f"held-out accuracy {acc}"


def test_save_load_roundtrip(trained, tmp_path):
    model, train_lex, _ = trained
    path = tmp_path / "g2p.npz"
    model.save(path)
    loaded = NeuralG2P.load(path)
    words = sorted(train_lex)[:10]
    assert model(words) == loaded(words)


def test_english_g2p_oov_routes_through_neural(trained):
    from lightningfastspeech2_tpu.data.vocab import to_ipa
    from lightningfastspeech2_tpu.synthesis.g2p import EnglishG2P

    model, train_lex, _ = trained
    g2p = EnglishG2P(neural=model)
    phones = g2p("bode")  # OOV for the (empty) lexicon
    expected = [to_ipa(_MAP[c], "arpabet") for c in "bode"]
    assert phones[:-1] == expected  # trailing [SILENCE]
