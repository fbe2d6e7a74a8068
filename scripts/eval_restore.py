#!/usr/bin/env python
"""Quantify the restoration chain (VERDICT r2 item 9).

The reference pipes vocoder output through the voicefixer ResUNet
(reference ``litfass/synthesis/generator.py:173-195``); this repo ships a
DSP chain in that slot (synthesis/restore.py). This script measures the
chain against a synthetic degradation suite so the deviation is a
number, not an assertion:

  degradations: hard clipping (0.5/0.7 of peak), additive white noise
  (5/10/20 dB SNR), clip+noise combined, and a clean-transparency null.

  metric: SI-SNR (dB) of degraded-vs-clean and restored-vs-clean at
  22.05 kHz. The chain outputs 44.1 kHz with a replicated air band that
  has no 22 kHz ground truth, so the restored signal is exactly
  band-limited-decimated back to 22.05 kHz first (the inverse of the
  chain's own rfft zero-pad upsampler); this isolates declip+denoise
  quality. Also reports log-spectral distance (LSD, dB).

Clean material: speech-like synthetic utterances (harmonic phones with
formants + unvoiced noise, data/synthetic.py bank) — the same class of
signal the vocoders emit in-tree.

Usage: [PYTHONPATH=...] JAX_PLATFORMS=cpu python scripts/eval_restore.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# force the CPU backend via jax.config (env vars are clobbered by this
# environment's sitecustomize; same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from lightningfastspeech2_tpu.data.synthetic import synth_phone
from lightningfastspeech2_tpu.synthesis.restore import AudioRestorer

SR = 22050


def make_clean(rng: np.random.Generator, seconds: float = 3.0) -> np.ndarray:
    """Concatenate random phones from the synthetic bank into an utterance."""
    labels = ["AA1", "IY0", "UW1", "EH0", "N", "S"]
    parts = []
    total = 0
    while total < int(seconds * SR):
        lab = labels[rng.integers(len(labels))]
        dur = float(rng.uniform(0.08, 0.25))
        seg = synth_phone(lab, dur, SR, rng)
        parts.append(seg)
        total += len(seg)
    x = np.concatenate(parts)[: int(seconds * SR)].astype(np.float32)
    return 0.6 * x / np.max(np.abs(x))


def clip_at(x: np.ndarray, level: float) -> np.ndarray:
    rail = level * np.max(np.abs(x))
    return np.clip(x, -rail, rail)


def add_noise(x: np.ndarray, snr_db: float, rng) -> np.ndarray:
    noise = rng.standard_normal(len(x)).astype(np.float32)
    p_sig = np.mean(x**2)
    p_noise = np.mean(noise**2)
    scale = np.sqrt(p_sig / (p_noise * 10 ** (snr_db / 10)))
    return x + scale * noise


def decimate_2x(y: np.ndarray) -> np.ndarray:
    """Exact inverse of restore.upsample_2x (band-limited, incl. the *2)."""
    n = len(y) // 2
    Y = np.fft.rfft(y)
    return np.fft.irfft(Y[: n // 2 + 1], n=n).astype(np.float32) * 0.5


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    n = min(len(est), len(ref))
    est, ref = est[:n], ref[:n]
    est = est - est.mean()
    ref = ref - ref.mean()
    s = (np.dot(est, ref) / np.dot(ref, ref)) * ref
    e = est - s
    return float(10 * np.log10(np.dot(s, s) / max(np.dot(e, e), 1e-12)))


def lsd(est: np.ndarray, ref: np.ndarray) -> float:
    n = min(len(est), len(ref))
    nfft, hop = 1024, 256
    frames = (n - nfft) // hop

    def spec(x):
        w = np.hanning(nfft)
        mats = np.stack(
            [x[i * hop : i * hop + nfft] * w for i in range(frames)]
        )
        return 10 * np.log10(np.abs(np.fft.rfft(mats, axis=-1)) ** 2 + 1e-10)

    d = spec(est[:n]) - spec(ref[:n])
    return float(np.mean(np.sqrt(np.mean(d**2, axis=-1))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--denoiser", choices=("spectral", "neural", "auto"),
                    default="auto",
                    help="denoise stage: the DSP gate, the learned mask "
                         "(synthesis/denoiser.py), or auto")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cleans = [make_clean(rng) for _ in range(4)]
    restorer = AudioRestorer(denoiser=args.denoiser)
    print(f"denoiser: "
          f"{'neural' if restorer._dn_params is not None else 'spectral'}")

    cases = [
        ("clean (transparency)", lambda x, r: x.copy()),
        ("clip 0.7*peak", lambda x, r: clip_at(x, 0.7)),
        ("clip 0.5*peak", lambda x, r: clip_at(x, 0.5)),
        ("noise 20 dB SNR", lambda x, r: add_noise(x, 20, r)),
        ("noise 10 dB SNR", lambda x, r: add_noise(x, 10, r)),
        ("noise 5 dB SNR", lambda x, r: add_noise(x, 5, r)),
        ("clip 0.7 + noise 15 dB", lambda x, r: add_noise(clip_at(x, 0.7), 15, r)),
    ]

    print(f"{'degradation':<26}{'SI-SNR in':>11}{'SI-SNR out':>12}"
          f"{'delta':>8}{'LSD in':>8}{'LSD out':>9}")
    rows = []
    for name, fn in cases:
        snr_in, snr_out, lsd_in, lsd_out = [], [], [], []
        for x in cleans:
            d = fn(x, rng).astype(np.float32)
            y = decimate_2x(restorer(d, SR))
            snr_in.append(si_snr(d, x))
            snr_out.append(si_snr(y, x))
            lsd_in.append(lsd(d, x))
            lsd_out.append(lsd(y, x))
        row = (name, np.mean(snr_in), np.mean(snr_out),
               np.mean(snr_out) - np.mean(snr_in),
               np.mean(lsd_in), np.mean(lsd_out))
        rows.append(row)
        print(f"{row[0]:<26}{row[1]:>11.1f}{row[2]:>12.1f}"
              f"{row[3]:>+8.1f}{row[4]:>8.2f}{row[5]:>9.2f}")
    return rows


if __name__ == "__main__":
    main()
