"""Stage attribution for the fused HiFi-GAN serving path on the live
backend: times jitted prefixes of generator_apply_fused (conv_pre, each
upsample+resblock stage, tail) and prints per-stage deltas.

    env PYTHONPATH=/root/repo:/root/.axon_site \
        JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
        python scripts/profile_vocoder_stages.py [B] [T]
"""

import sys
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.ops.pallas_hifigan import (
    fused_resblock,
    resblock_taps,
)
from lightningfastspeech2_tpu.vocoder import hifigan as hg
from lightningfastspeech2_tpu.vocoder.hifigan import (
    LRELU_SLOPE,
    conv1d,
    conv_transpose1d,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
DTYPE = jnp.bfloat16


def prefix_fn(cfg, n_stages, tail=False, tile_m=2048):
    """Forward through conv_pre + the first n_stages upsample/resblock
    groups (+ the conv_post tail when requested)."""

    def fn(params, mel):
        c = cfg
        p = params["params"]

        def wb(name):
            return (jnp.asarray(p[name]["kernel"], DTYPE),
                    jnp.asarray(p[name]["bias"], DTYPE))

        w, b = wb("conv_pre")
        x = conv1d(mel.astype(DTYPE), w, b, 1, 3)
        n_kernels = len(c.resblock_kernel_sizes)
        for i, (rate, k_up) in enumerate(
            zip(c.upsample_rates[:n_stages],
                c.upsample_kernel_sizes[:n_stages])
        ):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            w, b = wb(f"ups_{i}")
            x = conv_transpose1d(x, w, b, rate, (k_up - rate) // 2)
            fold = max(128 // ch, 1)
            Bb, L, _ = x.shape
            xf = x.reshape(Bb, L // fold, fold * ch)
            acc = None
            for j, (k, ds) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                rb = p[f"resblocks_{i * n_kernels + j}"]
                weights, shifts, biases = resblock_taps(
                    rb, k, tuple(ds), fold, DTYPE)
                y = fused_resblock(xf, weights, shifts, biases,
                                   tile_m=tile_m)
                acc = y if acc is None else acc + y
            x = (acc / n_kernels).reshape(Bb, L, ch)
        if tail:
            x = nn.leaky_relu(x, 0.01)
            w, b = wb("conv_post")
            x = conv1d(x, w, b, 1, 3)
            x = jnp.tanh(x)[..., 0]
        return x

    return jax.jit(fn)


def timed(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = hg.HifiGanConfig()
    gen = hg.Generator(cfg, dtype=DTYPE)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, T, cfg.num_mels)),
        jnp.float32,
    )
    params = gen.init(jax.random.PRNGKey(0), mel)

    # upsample-only prefixes (no resblocks) to split ConvT vs resblock cost
    def ups_only(n):
        def fn(params, mel):
            p = params["params"]

            def wb(name):
                return (jnp.asarray(p[name]["kernel"], DTYPE),
                        jnp.asarray(p[name]["bias"], DTYPE))

            w, b = wb("conv_pre")
            x = conv1d(mel.astype(DTYPE), w, b, 1, 3)
            for i, (rate, k_up) in enumerate(
                zip(cfg.upsample_rates[:n], cfg.upsample_kernel_sizes[:n])
            ):
                x = nn.leaky_relu(x, LRELU_SLOPE)
                w, b = wb(f"ups_{i}")
                x = conv_transpose1d(x, w, b, rate, (k_up - rate) // 2)
            return x

        return jax.jit(fn)

    prev = 0.0
    print(f"B={B} T={T} dtype=bf16")
    for n in range(5):
        t = timed(prefix_fn(cfg, n), params, mel)
        print(f"prefix stages<={n}: {t*1e3:8.2f} ms  (+{(t-prev)*1e3:6.2f})")
        prev = t
    t_tail = timed(prefix_fn(cfg, 4, tail=True), params, mel)
    print(f"full + tail      : {t_tail*1e3:8.2f} ms  (+{(t_tail-prev)*1e3:6.2f})")

    t_ups = timed(ups_only(4), params, mel)
    print(f"conv_pre+4 ConvT only: {t_ups*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
