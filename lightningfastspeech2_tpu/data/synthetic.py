"""Synthetic aligned corpus generator for tests and smoke training.

Produces LibriTTS-layout ``speaker/utt.wav`` + ``utt.TextGrid`` pairs whose
phones are vowel-like harmonic tones with distinct F0/formants, so duration,
pitch and energy are all learnable signals. The TextGrid alignment semantics
match what the reference's converter expects
(reference ``litfass/dataset/audio_utils.py:36-91``).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

from lightningfastspeech2_tpu.data import wav as wav_io
from lightningfastspeech2_tpu.data.textgrid import Interval, TextGrid, Tier, dump

PHONE_BANK = {
    "AA1": (120.0, (700, 1200)),
    "IY0": (180.0, (300, 2300)),
    "UW1": (140.0, (350, 800)),
    "EH0": (200.0, (550, 1800)),
    "N": (110.0, (250, 1200)),
    "S": (0.0, (5000, 7000)),  # unvoiced noise
}


def synth_phone(label: str, dur_s: float, sr: int, rng: np.random.Generator):
    f0, formants = PHONE_BANK[label]
    n = int(dur_s * sr)
    t = np.arange(n) / sr
    if f0 > 0:
        sig = np.zeros(n)
        for k in range(1, 9):
            amp = sum(np.exp(-(((k * f0) - f) / 400.0) ** 2) for f in formants) + 0.1 / k
            sig += amp * np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
    else:
        sig = rng.standard_normal(n) * 0.3
    # fade edges to avoid clicks
    fade = min(n // 8, 256)
    env = np.ones(n)
    env[:fade] = np.linspace(0, 1, fade)
    env[-fade:] = np.linspace(1, 0, fade)
    return (sig * env).astype(np.float32)


def make_corpus(
    root: Path,
    n_speakers: int = 2,
    n_utts: int = 4,
    sr: int = 22050,
    seed: int = 0,
    min_phones: int = 4,
    max_phones: int = 8,
) -> Path:
    root = Path(root)
    rng = np.random.default_rng(seed)
    labels = list(PHONE_BANK)
    for spk in range(n_speakers):
        spk_dir = root / f"spk{spk}"
        spk_dir.mkdir(parents=True, exist_ok=True)
        for u in range(n_utts):
            n_ph = int(rng.integers(min_phones, max_phones + 1))
            phones = [labels[int(rng.integers(len(labels)))] for _ in range(n_ph)]
            durs = rng.uniform(0.08, 0.25, n_ph)
            # leading/trailing silence the ingester must trim
            sil = 0.1
            wav_parts = [np.zeros(int(sil * sr), np.float32)]
            intervals = [Interval(0.0, sil, "sil")]
            t = sil
            for p, d in zip(phones, durs):
                wav_parts.append(synth_phone(p, d, sr, rng))
                intervals.append(Interval(t, t + d, p))
                t += d
            wav_parts.append(np.zeros(int(sil * sr), np.float32))
            intervals.append(Interval(t, t + sil, ""))
            wav = np.concatenate(wav_parts)
            wav = 0.7 * wav / max(np.abs(wav).max(), 1e-9)

            tg = TextGrid(
                0.0,
                t + sil,
                (
                    Tier("words", (Interval(0.0, t + sil, "synthetic"),)),
                    Tier("phones", tuple(intervals)),
                ),
            )
            utt = f"spk{spk}_utt{u}"
            wav_io.write(spk_dir / f"{utt}.wav", wav, sr)
            (spk_dir / f"{utt}.TextGrid").write_text(dump(tg))
    return root
