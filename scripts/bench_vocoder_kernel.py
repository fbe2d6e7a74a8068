"""Compiled-mode validation + A/B benchmark of the fused HiFi-GAN
resblock Pallas kernel (ops/pallas_hifigan.py) vs the XLA generator on
the real TPU. Run with the default (TPU) backend:

    env PYTHONPATH=/root/repo:/root/.axon_site \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
        python scripts/bench_vocoder_kernel.py [B] [T]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.vocoder import hifigan as hg

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024


def timed(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # host read: proves execution
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    cfg = hg.HifiGanConfig()
    gen = hg.Generator(cfg, dtype=jnp.bfloat16)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, cfg.num_mels)),
        jnp.float32,
    )
    params = gen.init(jax.random.PRNGKey(0), mel)

    xla = jax.jit(gen.apply)
    t_xla, ref = timed(xla, params, mel)
    print(f"XLA generator       B={B} T={T}: {t_xla*1e3:8.2f} ms")

    fused = jax.jit(
        lambda p, m: hg.generator_apply_fused(p, m, cfg, dtype=jnp.bfloat16)
    )
    t_fused, out = timed(fused, params, mel)
    print(f"fused-Pallas path   B={B} T={T}: {t_fused*1e3:8.2f} ms "
          f"({t_xla/t_fused:.2f}x)")

    a = np.asarray(ref, np.float32)
    b = np.asarray(out, np.float32)
    err = np.abs(a - b).max()
    print(f"max |xla - fused| = {err:.4f}  (bf16 wav in [-1,1])")
    audio_s = B * T * cfg.hop_length / cfg.sampling_rate
    print(f"fused vocoder throughput: {audio_s/t_fused:,.0f} audio-s/s/chip")


if __name__ == "__main__":
    main()
