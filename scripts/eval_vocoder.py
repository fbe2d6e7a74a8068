#!/usr/bin/env python
"""Waveform-domain quality evaluation of a trained HiFi-GAN vocoder.

VERDICT r3 item 1: nothing in this repo had ever produced an audible
waveform through a TRAINED vocoder. This script closes the measurement
half of that item:

  copy-synthesis mode (default):
      ground-truth wav -> mel (audio/mel.py, the acoustic model's exact
      front-end) -> trained vocoder -> wav'; report mel-domain metrics of
      wav' against the original (mel L1, MCD, log-spectral distance) plus
      time-domain SI-SNR (auxiliary: a GAN vocoder is phase-blind, so
      SI-SNR is expected to be low even when the audio is clean — the
      mel-domain rows are the quality statement, matching how the
      upstream HiFi-GAN paper evaluates with mel error + MOS).

  --compare_dir mode:
      a directory of {utt}.wav + {utt}_original.wav pairs (the generate
      CLI's dataset re-synthesis layout) -> the same mel-domain metrics,
      DTW-aligned (full TTS re-synthesis follows predicted durations, so
      frames do not align 1:1 with ground truth).

Writes wav artifacts (original + vocoded) for listening and prints a
markdown table for BASELINE.md.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_vocoder.py \
      --vocoder_checkpoint _campaign/vocoder_ckpts \
      --corpus _campaign/valid --out _campaign/vocoder_eval --n_utts 24
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    n = min(len(est), len(ref))
    est, ref = est[:n].astype(np.float64), ref[:n].astype(np.float64)
    est = est - est.mean()
    ref = ref - ref.mean()
    s = (np.dot(est, ref) / max(np.dot(ref, ref), 1e-12)) * ref
    e = est - s
    return float(10 * np.log10(max(np.dot(s, s), 1e-12)
                               / max(np.dot(e, e), 1e-12)))


def lsd(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Log-spectral distance over the mel bands (mels are already log10
    compressed by the front-end; LSD in dB = 10 * rms difference)."""
    n = min(len(mel_a), len(mel_b))
    d = 10.0 * (mel_a[:n] - mel_b[:n])
    return float(np.sqrt(np.mean(d**2)))


def dtw_align(mel_a: np.ndarray, mel_b: np.ndarray):
    """Plain DP DTW on per-frame euclidean distance; returns the aligned
    index paths. Frames are a few hundred per utterance — O(T^2) numpy is
    instant on the host."""
    a2 = np.sum(mel_a**2, axis=1)[:, None]
    b2 = np.sum(mel_b**2, axis=1)[None, :]
    d = np.sqrt(np.maximum(a2 + b2 - 2 * mel_a @ mel_b.T, 0.0))
    Ta, Tb = d.shape
    acc = np.full((Ta + 1, Tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, Ta + 1):
        acc[i, 1:] = d[i - 1]
        run = np.minimum(acc[i - 1, 1:], acc[i - 1, :-1])
        for j in range(1, Tb + 1):
            acc[i, j] += min(run[j - 1], acc[i, j - 1])
    # backtrack
    i, j = Ta, Tb
    path_a, path_b = [], []
    while i > 0 and j > 0:
        path_a.append(i - 1)
        path_b.append(j - 1)
        moves = [(acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1)]
        _, i, j = min(moves)
    return np.asarray(path_a[::-1]), np.asarray(path_b[::-1])


def mel_metrics(mel_ref: np.ndarray, mel_est: np.ndarray, aligned: bool):
    from lightningfastspeech2_tpu.train.metrics import mel_cepstral_distortion

    if not aligned:
        pa, pb = dtw_align(mel_ref, mel_est)
        mel_ref, mel_est = mel_ref[pa], mel_est[pb]
    n = min(len(mel_ref), len(mel_est))
    mel_ref, mel_est = mel_ref[:n], mel_est[:n]
    return {
        "mel_l1": float(np.mean(np.abs(mel_ref - mel_est))),
        # DCT c1-13 cepstral distance over the 80-band log10-mel; NOT
        # comparable to literature MCD (WORLD MCEPs + DTW, typically
        # 4-8 dB) — advisor round-4 finding: label it what it is
        "cepstral_dist_db": float(mel_cepstral_distortion(mel_est, mel_ref)),
        "lsd_db": lsd(mel_ref, mel_est),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocoder_checkpoint", type=str, default=None,
                    help="cli.train_vocoder checkpoint dir (copy-synthesis)")
    ap.add_argument("--corpus", type=str, default="_campaign/valid")
    ap.add_argument("--compare_dir", type=str, default=None,
                    help="generate-CLI re-synthesis dir of "
                         "{utt}.wav + {utt}_original.wav pairs")
    ap.add_argument("--out", type=str, default=None,
                    help="write original/vocoded wav artifacts here")
    ap.add_argument("--n_utts", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save_first", type=int, default=6,
                    help="artifacts for the first N evaluated utterances")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (mel-only compare runs "
                         "fine host-side and must not contend for the "
                         "single tunneled TPU)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from lightningfastspeech2_tpu.core.config import AudioConfig
    from lightningfastspeech2_tpu.data import wav as wav_io

    acfg = AudioConfig()
    rows = []

    if args.compare_dir:
        pairs = sorted(Path(args.compare_dir).rglob("*_original.wav"))
        rng = np.random.default_rng(args.seed)
        rng.shuffle(pairs)
        pairs = pairs[: args.n_utts]
        import jax

        from lightningfastspeech2_tpu.audio.mel import mel_spectrogram

        mel_fn = jax.jit(lambda w: mel_spectrogram(w, acfg))
        for orig_path in pairs:
            synth_path = orig_path.with_name(
                orig_path.name.replace("_original", ""))
            if not synth_path.exists():
                continue
            ref, sr_r = wav_io.read(orig_path)
            est, sr_e = wav_io.read(synth_path)
            ref = wav_io.resample(ref.astype(np.float32), sr_r,
                                  acfg.sampling_rate)
            est = wav_io.resample(est.astype(np.float32), sr_e,
                                  acfg.sampling_rate)
            mel_ref = np.asarray(mel_fn(ref))
            mel_est = np.asarray(mel_fn(est))
            rows.append(mel_metrics(mel_ref, mel_est, aligned=False))
        title = f"full TTS re-synthesis ({args.compare_dir})"
    else:
        assert args.vocoder_checkpoint, (
            "--vocoder_checkpoint required for copy-synthesis mode")
        import jax
        import jax.numpy as jnp

        from lightningfastspeech2_tpu.audio.mel import mel_spectrogram
        from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
        from lightningfastspeech2_tpu.vocoder import hifigan as hg

        tree, _, sidecar = Checkpointer(args.vocoder_checkpoint).restore()
        gc = dict((sidecar or {}).get("hifigan_config") or {})
        if "resblock_dilation_sizes" in gc:
            gc["resblock_dilation_sizes"] = tuple(
                tuple(d) for d in gc["resblock_dilation_sizes"])
        gc = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in gc.items()}
        voc_cfg = hg.HifiGanConfig(**gc) if gc else hg.HifiGanConfig()
        params = jax.tree_util.tree_map(np.asarray, tree["params"]["gen"])
        step = int(tree["step"])
        print(f"vocoder checkpoint step {step}")
        synth = hg.Synthesiser(voc_cfg, params=params)
        mel_fn = jax.jit(lambda w: mel_spectrogram(w, acfg))

        wavs = sorted(Path(args.corpus).rglob("*.wav"))
        rng = np.random.default_rng(args.seed)
        rng.shuffle(wavs)
        wavs = wavs[: args.n_utts]
        out_dir = Path(args.out) if args.out else None
        if out_dir:
            out_dir.mkdir(parents=True, exist_ok=True)
        si = []
        for wi, path in enumerate(wavs):
            raw, sr = wav_io.read(path)
            ref = wav_io.resample(raw.astype(np.float32), sr,
                                  acfg.sampling_rate)
            peak = np.max(np.abs(ref))
            if peak > 0:
                ref = ref / peak  # the trainer's load-time peak norm
            mel_ref = np.asarray(mel_fn(ref))
            est = synth(mel_ref[: len(ref) // acfg.hop_length]) / 32768.0
            if est.ndim > 1:
                est = est[0]
            mel_est = np.asarray(mel_fn(est.astype(np.float32)))
            m = mel_metrics(mel_ref, mel_est, aligned=True)
            m["si_snr_db"] = si_snr(est, ref)
            si.append(m["si_snr_db"])
            rows.append(m)
            if out_dir and wi < args.save_first:
                wav_io.write(out_dir / f"{path.stem}_original.wav", ref,
                             acfg.sampling_rate)
                wav_io.write(out_dir / f"{path.stem}_vocoded.wav",
                             np.clip(est, -1, 1), acfg.sampling_rate)
        title = (f"copy-synthesis ({args.vocoder_checkpoint} @ step {step}, "
                 f"{len(rows)} held-out utts)")

    if not rows:
        raise SystemExit("no utterances evaluated")
    keys = rows[0].keys()
    print(f"\n### {title}\n")
    print("| metric | mean | median | worst |")
    print("|---|---|---|---|")
    for k in keys:
        vals = np.asarray([r[k] for r in rows])
        worst = vals.min() if "snr" in k else vals.max()
        print(f"| {k} | {vals.mean():.3f} | {np.median(vals):.3f} "
              f"| {worst:.3f} |")


if __name__ == "__main__":
    main()
