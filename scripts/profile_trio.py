#!/usr/bin/env python
"""Same-process A/B of the trio-fused HiFi-GAN stage kernel vs the
per-resblock fused path (NOTES_ROUND4 item 4: re-estimate the resblock
chain the FastDiff way — fusion scope, not per-op time).

Both variants are timed as identical-structure loops in one process so
tunnel bias cancels; the trio is swept over tile_m.

    env PYTHONPATH=/root/repo:/root/.axon_site \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
        python -u scripts/profile_trio.py [B] [T] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.vocoder import hifigan as hg

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / ITERS, out


def main():
    cfg = hg.HifiGanConfig()
    gen = hg.Generator(cfg, dtype=jnp.bfloat16)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, cfg.num_mels)),
        jnp.float32,
    )
    params = gen.init(jax.random.PRNGKey(0), mel)
    audio_s = B * T * cfg.hop_length / cfg.sampling_rate

    per_rb = jax.jit(lambda p, m: hg.generator_apply_fused(
        p, m, cfg, dtype=jnp.bfloat16, use_trio=False))
    t_rb, ref = timed(per_rb, params, mel)
    print(f"per-resblock fused     : {t_rb*1e3:8.2f} ms "
          f"({audio_s/t_rb:,.0f} audio-s/s)")

    for tile_m in (1024, 2048, 4096):
        trio = jax.jit(lambda p, m, tm=tile_m: hg.generator_apply_fused(
            p, m, cfg, dtype=jnp.bfloat16, tile_m=tm, use_trio=True))
        try:
            t_tr, out = timed(trio, params, mel)
        except Exception as e:
            print(f"trio tile_m={tile_m:5d}     : FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        err = np.abs(np.asarray(ref, np.float32)
                     - np.asarray(out, np.float32)).max()
        print(f"trio tile_m={tile_m:5d}     : {t_tr*1e3:8.2f} ms "
              f"({audio_s/t_tr:,.0f} audio-s/s, {t_rb/t_tr:.2f}x, "
              f"max|err|={err:.5f})")


if __name__ == "__main__":
    main()
