#!/usr/bin/env python
"""Phoneme-error-rate comparison: neural G2P vs the rule LTS fallback.

The reference ships g2p_en's pretrained OOV model (reference
``litfass/synthesis/g2p.py:4,28-43``); this repo trains its own
(scripts/train_g2p.py) and must show it beats the deterministic
letter-to-sound rules before it becomes the shipped default. PER =
phone-level edit distance / reference phone count over a seeded random
held-out word set (stress stripped, the form synthesis consumes).

Usage: python scripts/eval_g2p.py \
    [--lexicon .../lexicon_en_expanded.txt] [--model .../g2p_en.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def edit_distance(a, b) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def per(pairs) -> float:
    dist = sum(edit_distance(p, t) for p, t in pairs)
    total = sum(len(t) for _, t in pairs)
    return dist / max(total, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lexicon",
                   default="lightningfastspeech2_tpu/data/lexicon_en_expanded.txt")
    p.add_argument("--model", default="lightningfastspeech2_tpu/data/g2p_en.npz")
    p.add_argument("--holdout", type=int, default=250)
    args = p.parse_args()

    from lightningfastspeech2_tpu.data.vocab import strip_stress
    from lightningfastspeech2_tpu.synthesis.g2p import G2P, letter_to_sound
    from lightningfastspeech2_tpu.synthesis.neural_g2p import NeuralG2P

    class _Lex(G2P):
        def __call__(self, text):
            raise NotImplementedError

    lexicon = _Lex(args.lexicon).lexicon
    words = sorted(lexicon)
    rng = np.random.default_rng(0)
    held_idx = set(rng.choice(len(words), size=min(args.holdout, len(words)),
                              replace=False).tolist())
    held = [w for i, w in enumerate(words) if i in held_idx]
    truth = {w: [strip_stress(ph) for ph in lexicon[w]] for w in held}

    model = NeuralG2P.load(args.model)
    neural_raw = model(held)
    neural_pairs, lts_pairs = [], []
    n_word_ok_neural = n_word_ok_lts = 0
    for w, pred in zip(held, neural_raw):
        np_pred = [strip_stress(ph) for ph in pred]
        lts_pred = [strip_stress(ph) for ph in letter_to_sound(w)]
        neural_pairs.append((np_pred, truth[w]))
        lts_pairs.append((lts_pred, truth[w]))
        n_word_ok_neural += np_pred == truth[w]
        n_word_ok_lts += lts_pred == truth[w]

    n = len(held)
    print(f"{n} held-out words (seeded random, stress-stripped)")
    print(f"rule LTS : PER {per(lts_pairs):.3f}  "
          f"word acc {n_word_ok_lts / n:.3f}")
    print(f"neural   : PER {per(neural_pairs):.3f}  "
          f"word acc {n_word_ok_neural / n:.3f}")


if __name__ == "__main__":
    main()
