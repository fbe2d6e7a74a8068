#!/usr/bin/env python
"""Serving throughput through the REAL SpeechGenerator path (VERDICT r4
item 8).

Every prior serving number came from bench.py's synthetic rows (pinned
P=256 phone pad, hand-built batches). This script measures what a user
actually gets: ``cli.generate``'s `load_generator` -> `SpeechGenerator.
generate_from_text` with the two-pass duration chooser picking BOTH the
phone bucket and the frame bucket, text in, waveform out — including
G2P, host collation, vocoder, and the numpy round trips.

Sentences span a realistic length distribution (~1.5 s to ~12 s of
speech). Reports per-sentence buckets, total audio seconds, wall time,
and audio-s/s for (a) the full chain and (b) the acoustic pass alone
(vocoder skipped), so the acoustic-vs-vocoder split is attributable.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving_path.py \
      --checkpoint_dir _campaign/ckpts \
      --hifigan_checkpoint _campaign/vocoder_ckpts --vocoder_precision 16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTENCES = [
    "Hello there.",
    "The quick brown fox jumps over the lazy dog.",
    "Speech synthesis converts written language into audible speech.",
    "A benchmark is only honest when it measures the path users run, "
    "not a synthetic proxy built for the measurement.",
    "The variance adaptor predicts duration, pitch, and energy for every "
    "phone before the length regulator expands them to frames.",
    "On tensor processing units, the matrix unit wants large, batched, "
    "low precision multiplications, and the compiler wants static shapes; "
    "serving systems that respect both constraints keep the chip busy "
    "and the latency flat across utterance lengths.",
]


def main():
    import numpy as np

    from lightningfastspeech2_tpu.cli.generate import (
        build_parser,
        load_generator,
    )

    args = build_parser().parse_args()
    assert args.checkpoint_dir, "--checkpoint_dir required"
    gen, _, _ = load_generator(args)

    import jax

    print("backend:", jax.default_backend(),
          "| frame_bucketing:", gen.frame_bucketing)

    sr = gen.sampling_rate
    rng_seed = 0

    hop = gen.cfg.model.audio.hop_length
    n_mels = gen.cfg.model.audio.n_mels

    def run_all(label):
        total_audio = 0.0
        t0 = time.perf_counter()
        for i, s in enumerate(SENTENCES):
            wav = gen.generate_from_text(s, seed=rng_seed + i,
                                         prior_strategy="sample")
            if gen.synthesiser is None:
                # no-vocoder stub returns flattened mel frames: audio
                # seconds = frames * hop / sr, not len/sr
                total_audio += (len(wav) // n_mels) * hop / sr
            else:
                total_audio += len(wav) / gen.output_sampling_rate
        dt = time.perf_counter() - t0
        print(f"{label}: {total_audio:6.2f} audio-s in {dt:6.3f} s "
              f"-> {total_audio / dt:8.1f} audio-s/s")
        return total_audio / dt

    # pass 1: compile every (P, T) bucket + the vocoder shapes
    ids_lens = []
    for s in SENTENCES:
        ids = gen.text_to_ids(s)
        ids_lens.append(len(ids))
    print("phone counts:", ids_lens,
          "-> P buckets:", [gen.bucketer.phone_bucket(n) for n in ids_lens])
    run_all("warmup (compiles)")

    # timed passes
    full = max(run_all("full chain (acoustic+vocoder)") for _ in range(2))

    synth = gen.synthesiser
    gen.synthesiser = None
    run_all("warmup acoustic-only")
    acoustic = max(run_all("acoustic only") for _ in range(2))
    gen.synthesiser = synth

    print(f"\nsummary: full={full:.1f} acoustic_only={acoustic:.1f} "
          f"audio-s/s over {len(SENTENCES)} utterances, B=1 sequential")


if __name__ == "__main__":
    main()
