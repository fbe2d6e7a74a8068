#!/usr/bin/env python
"""Train the restoration chain's learned-mask denoiser (host CPU).

Produces ``lightningfastspeech2_tpu/data/denoiser.npz`` — the neural
prior for the VoiceFixer-slot denoise stage (synthesis/denoiser.py; the
round-3 DSP gate managed only +2.4-3.1 dB on noisy input, the known
no-learned-prior ceiling). Trains on clean clips from a corpus dir (wav
files, e.g. _campaign/corpus) or, absent one, on synthetic utterances.

Usage: python scripts/train_denoiser.py [--corpus _campaign/corpus]
           [--steps 3000] [--out lightningfastspeech2_tpu/data/denoiser.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default="_campaign/corpus")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n_clips", type=int, default=64)
    p.add_argument("--out",
                   default="lightningfastspeech2_tpu/data/denoiser.npz")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from pathlib import Path

    from lightningfastspeech2_tpu.data import wav as wav_io
    from lightningfastspeech2_tpu.synthesis.denoiser import (
        save,
        train_denoiser,
    )

    rng = np.random.default_rng(args.seed)
    clips = []
    corpus = Path(args.corpus)
    if corpus.is_dir():
        paths = sorted(corpus.rglob("*.wav"))
        rng.shuffle(paths)
        for path in paths[: args.n_clips]:
            w, sr = wav_io.read(path)
            w = wav_io.resample(w.astype(np.float32), sr, 22050)
            peak = np.max(np.abs(w))
            if peak > 0:
                clips.append(0.6 * w / peak)
    if not clips:
        print("no corpus wavs; using synthetic utterances")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from eval_restore import make_clean

        clips = [make_clean(rng) for _ in range(16)]
    print(f"{len(clips)} clean clips")

    params = train_denoiser(clips, steps=args.steps, batch=args.batch,
                            seed=args.seed, verbose=True)
    save(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
