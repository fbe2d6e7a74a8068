#!/usr/bin/env python
"""A/B the fused FastDiff LVC-stack Pallas kernel vs the XLA eps path.

Round-2/3 attribution (BASELINE.md): after fast gating, the remaining
FastDiff serving cost is dilated convs (~1.5 ms/stage-3 pass) plus
per-layer HBM passes of the C=32 activation that XLA cannot amortize.
The fused kernel (ops/pallas_fastdiff.py) keeps each upsample stage's
4-layer chain VMEM-resident. This measures, on the full N=4 reverse
sampler with identical params/mel/noise:

  1. throughput XLA vs fused, f32/bf16, exact and fast gating,
  2. fused-vs-XLA output SNR (kernel numerics at serving precision).

Results go to BASELINE.md.

Usage: python scripts/profile_fastdiff_fused.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    eps_apply_fused,
)

B, T = 4, 256
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def sampler(fd, mel, sched, shape, fused: bool):
    @jax.jit
    def vocode(params, mel, carry):
        mel_c = mel + carry * 1e-30
        if fused:
            eps_fn = lambda x, ts: eps_apply_fused(
                params, fd.cfg, x, mel_c, ts, dtype=fd.dtype
            ).astype(jnp.float32)
        else:
            eps_fn = lambda x, ts: fd.model.apply(
                params, x, mel_c, ts).astype(jnp.float32)
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
    base = FastDiffVocoder(FastDiffConfig(), rng=jax.random.PRNGKey(7),
                           fused=False)
    sched = fd_diff.make_inference_schedule(base.hp, 4)
    shape = (B, T * base.cfg.hop_length)
    audio_s = B * T * base.cfg.hop_length / 22050
    mel = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, T, 80)), jnp.float32
    )

    results, wavs = {}, {}
    for fast in (False, True):
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            for fused in (False, True):
                cfg = dataclasses.replace(FastDiffConfig(),
                                          fast_gating=fast)
                fd = FastDiffVocoder(cfg, params=base.params, dtype=dtype,
                                     fused=False)
                vocode = sampler(fd, mel, sched, shape, fused)

                def step(carry, _v=vocode, _p=fd.params):
                    wav = _v(_p, mel, carry)
                    return wav[0, 0].astype(jnp.float32) * 1e-30

                key = (f"{'fast' if fast else 'exact'}_{tag}_"
                       f"{'fused' if fused else 'xla'}")
                try:
                    wav = vocode(fd.params, mel, jnp.zeros(()))
                    wavs[key] = np.asarray(wav, np.float64)
                except Exception as e:  # compile failures must not kill A/B
                    print(f"{key:22s} FAILED: {type(e).__name__}: "
                          f"{str(e)[:200]}")
                    continue
                r, dt = rate(step, ITERS, audio_s)
                results[key] = (r, dt * 1e3)
                print(f"{key:22s} {r:9.1f} audio-s/s  {dt*1e3:7.2f} ms")

    for base_key, fused_key in [(k.replace("_fused", "_xla"), k)
                                for k in sorted(wavs) if k.endswith("_fused")]:
        if base_key not in wavs:
            continue
        ref, test = wavs[base_key], wavs[fused_key]
        snr = 10 * np.log10(
            np.sum(ref ** 2) / max(np.sum((ref - test) ** 2), 1e-30))
        sp = (results[fused_key][0] / results[base_key][0]
              if base_key in results and fused_key in results else float("nan"))
        print(f"{fused_key}: vs xla SNR {snr:.1f} dB, speedup {sp:.3f}x")


if __name__ == "__main__":
    main()
