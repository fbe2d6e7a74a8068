#!/usr/bin/env python
"""A/B the FastDiff LVC gate: exact sigmoid*tanh vs the rational
approximations (vocoder/fastdiff.py fast_tanh/fast_sigmoid).

Round-2 attribution (NOTES_ROUND3.md): ~4.5 ms of the 6.6 ms stage-3
block per eps pass is the gating transcendentals at audio rate —
VPU-bound, untouched by memory-traffic fusions. This measures what the
cheap gate actually buys AND what it costs in output fidelity:

  1. waveform SNR of fast vs exact on the full N=4 reverse sampler
     (identical params, mel, and noise draws),
  2. serving throughput exact vs fast, f32 and bf16.

Results go to BASELINE.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core.compile_cache import (
    enable_fast_prng,
    enable_persistent_cache,
)

enable_persistent_cache()
enable_fast_prng()

import dataclasses

from lightningfastspeech2_tpu.vocoder import diffusion as fd_diff
from lightningfastspeech2_tpu.vocoder.fastdiff import (
    FastDiffConfig,
    FastDiffVocoder,
)

B, T = 4, 256
ITERS = 10


def make_vocoder(fast: bool, dtype, params=None):
    cfg = dataclasses.replace(FastDiffConfig(), fast_gating=fast)
    return FastDiffVocoder(cfg, rng=jax.random.PRNGKey(7) if params is None
                           else None, params=params, dtype=dtype)


def sampler(fd, mel, sched, shape):
    @jax.jit
    def vocode(params, mel, carry):
        eps_fn = lambda x, ts: fd.model.apply(
            params, x, mel + carry * 1e-30, ts
        ).astype(jnp.float32)
        return fd_diff.reverse_sample(eps_fn, shape, sched,
                                      jax.random.PRNGKey(8))
    return vocode


def rate(step, iters, audio_s):
    def chain(n):
        c = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(c)
        float(c)
        return time.perf_counter() - t0

    lat = min(chain(1), chain(1))
    total = chain(iters)
    dt = max(total - lat, 1e-9) / max(iters - 1, 1)
    return audio_s / dt, dt


def main():
    print("backend:", jax.default_backend())
    base = make_vocoder(False, jnp.float32)
    sched = fd_diff.make_inference_schedule(base.hp, 4)
    shape = (B, T * base.cfg.hop_length)
    audio_s = B * T * base.cfg.hop_length / 22050
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, 80)), jnp.float32
    )

    results = {}
    wavs = {}
    for fast in (False, True):
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            fd = make_vocoder(fast, dtype, params=base.params)
            vocode = sampler(fd, mel, sched, shape)

            def step(carry, _v=vocode, _p=fd.params):
                wav = _v(_p, mel, carry)
                return wav[0, 0].astype(jnp.float32) * 1e-30

            wav = vocode(fd.params, mel, jnp.zeros(()))  # compile
            wav.block_until_ready()
            key = f"{'fast' if fast else 'exact'}_{tag}"
            wavs[key] = np.asarray(wav, np.float64)
            r, dt = rate(step, ITERS, audio_s)
            results[key] = (r, dt * 1e3)
            print(f"{key:12s} {r:9.1f} audio-s/s  {dt*1e3:7.2f} ms")

    for tag in ("f32", "bf16"):
        ref, test = wavs[f"exact_{tag}"], wavs[f"fast_{tag}"]
        snr = 10 * np.log10(
            np.sum(ref ** 2) / max(np.sum((ref - test) ** 2), 1e-30)
        )
        speedup = results[f"fast_{tag}"][0] / results[f"exact_{tag}"][0]
        print(f"{tag}: fast-vs-exact SNR {snr:.1f} dB, speedup {speedup:.3f}x")
    # bf16 exact vs f32 exact for context (the accepted --vocoder_precision
    # 16 deviation)
    ref, test = wavs["exact_f32"], wavs["exact_bf16"]
    snr = 10 * np.log10(
        np.sum(ref ** 2) / max(np.sum((ref - test) ** 2), 1e-30)
    )
    print(f"context: exact bf16 vs exact f32 SNR {snr:.1f} dB")


if __name__ == "__main__":
    main()
