#!/usr/bin/env python
"""Headline benchmark: audio-seconds of mel synthesized per second per chip.

The reference publishes no throughput numbers (BASELINE.md) — this bench
*establishes* the baseline the driver records each round. Workload: the
flagship multi-speaker LightSpeech acoustic model in bf16, teacher-forced
durations filling the full frame bucket (synthesis compute at 100%
utilization), batch 8 x 2048 frames (~23.8 s audio per item at hop 256 /
22.05 kHz).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the first recorded value in BENCH_r1
(18.08.2026: none existed -> 1.0 by definition; see BASELINE.md).
"""

import json
import os
import sys
import time

BASELINE_AUDIO_S_PER_S = None  # set once round-1 numbers are recorded


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2,
        make_dummy_batch,
    )

    B = int(os.environ.get("BENCH_BATCH", 8))
    P = int(os.environ.get("BENCH_PHONES", 256))
    T = int(os.environ.get("BENCH_FRAMES", 2048))

    cfg = C.lightspeech_76m()
    mcfg = C.replace(cfg.model, max_phones=P, max_frames=T)
    model = FastSpeech2(mcfg, dtype=jnp.bfloat16)

    n_valid = P - 16
    batch = make_dummy_batch(mcfg, batch_size=B, n_phones=n_valid)
    # teacher durations exactly fill the frame bucket -> 100% frame
    # utilization, every batch item synthesizes T frames of audio
    per = T // n_valid
    rem = T - per * n_valid
    dur = np.zeros((B, P), dtype=np.int32)
    dur[:, :n_valid] = per
    dur[:, :rem] += 1
    batch["duration"] = dur
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    init = jax.jit(lambda rngs, b: model.init(rngs, b, deterministic=True))
    params = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sdp": jax.random.PRNGKey(2)},
        batch,
    )

    @jax.jit
    def synthesize(params, batch, carry):
        # carry creates a data dependency between successive steps so the
        # measurement reflects true sequential execution (the remote-TPU
        # tunnel used here acks dispatches before execution completes, so
        # naive block_until_ready undercounts); the epsilon-scaled carry
        # cannot be DCE'd but perturbs nothing at fp precision
        b = dict(batch)
        b["speaker"] = batch["speaker"] + carry * 1e-30
        out = model.apply(params, b, deterministic=True)
        # duration predictions too, so the duration tower is not DCE'd
        return out["mel"], out["duration_prediction"]

    # warmup / compile
    carry = jnp.zeros(())
    mel, dpred = synthesize(params, batch, carry)
    float(jnp.sum(dpred.astype(jnp.float32)))  # full round trip

    def run(iters):
        carry = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(iters):
            mel, dpred = synthesize(params, batch, carry)
            carry = dpred[0, 0].astype(jnp.float32)
        _ = float(carry)  # single host read at the end
        return time.perf_counter() - t0

    # one round-trip latency estimate from a zero-iteration chain
    lat = min(run(1), run(1))
    iters = int(os.environ.get("BENCH_ITERS", 50))
    total = run(iters)
    dt = max(total - lat, 1e-9) / max(iters - 1, 1)

    hop, sr = mcfg.audio.hop_length, mcfg.audio.sampling_rate
    audio_seconds = B * T * hop / sr
    value = audio_seconds / dt
    vs = 1.0 if not BASELINE_AUDIO_S_PER_S else value / BASELINE_AUDIO_S_PER_S
    print(
        json.dumps(
            {
                "metric": "audio_seconds_synthesized_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
