#!/usr/bin/env python
"""A/B the deterministic forward with flash attention forced on vs off.

Round-2 left the Pallas flash-attention kernel (ops/pallas_attention.py)
disabled for deterministic forwards based on a ~7% in-model delta measured
through the tunnel (models/layers.py:_flash_ok docstring); NOTES_ROUND3.md
item 5 flags that decision as made at tunnel-noise level.  This script
re-measures both variants as single on-chip lax.scan programs (the
methodology bench.py uses for device_fwd_ms), which excludes per-dispatch
tunnel overhead entirely.

Usage: python scripts/profile_flash_fwd.py [iters]
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

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.models import layers
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2,
    make_dummy_batch,
)

B, P, T = 8, 256, 2048
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50

cfg = C.lightspeech_flagship()
mcfg = C.replace(cfg.model, max_phones=P, max_frames=T)
model = FastSpeech2(mcfg, dtype=jnp.bfloat16)

n_valid = P - 16
batch = make_dummy_batch(mcfg, batch_size=B, n_phones=n_valid)
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

_orig_flash_ok = layers._flash_ok


def run(label, flash_ok):
    layers._flash_ok = flash_ok

    @jax.jit
    def scan(params, batch):
        def body(c, _):
            b = dict(batch)
            b["speaker"] = batch["speaker"] + c * 1e-30
            out = model.apply(params, b, deterministic=True)
            return (out["mel"][0, 0, 0].astype(jnp.float32)
                    + out["duration_prediction"][0, 0].astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return c

    float(scan(params, batch))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan(params, batch))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label}: {best * 1e3:.3f} ms/fwd")
    return best


off = run("flash OFF (einsum attention)", lambda T, d, det: False)
on = run("flash ON  (Pallas kernel)    ",
         lambda T, d, det: _orig_flash_ok(T, d, False))
layers._flash_ok = _orig_flash_ok
print(f"delta: flash is {off / on:.3f}x the einsum path "
      f"({'faster' if on < off else 'slower'})")
