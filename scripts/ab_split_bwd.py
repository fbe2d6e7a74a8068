#!/usr/bin/env python
"""On-chip A/B: fused vs split flash-attention backward (VERDICT r4 item 6).

The split form (ops/pallas_attention.py `_bwd_split`) replaces the fused
backward's read-modify-write dK/dV accumulation across query tiles with a
q-tiled dQ pass plus a K-MAJOR dK/dV pass that writes each tile once,
paying one extra P^T recomputation (probabilities reconstructed from the
forward's saved LSE). It landed in round 4 opt-in with interpret-mode
parity only — never measured on the chip. This script times the FULL
training grad (flagship, B=8 P=256 T=2048, dropout on) both ways with
the on-chip scan methodology (sweep_attention_bwd.py), so the number is
the one that decides default-on vs delete.

Note the forward differs too: the split path's forward emits the LSE
output (the fused path's forward does not), so the A/B compares the
complete fwd+bwd cost of each configuration — which is what training
pays.

Usage: python scripts/ab_split_bwd.py [iters]
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
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2,
    make_dummy_batch,
)
from lightningfastspeech2_tpu.train.step import _loss_fn, create_train_state

B, P, T = 8, 256, 2048
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def main():
    print("backend:", jax.default_backend())
    cfg = C.lightspeech_flagship()
    mcfg = C.replace(cfg.model, max_phones=P, max_frames=T)
    tcfg = C.replace(cfg, model=mcfg)
    model = FastSpeech2(mcfg, dtype=jnp.bfloat16)
    n_valid = P - 16
    batch = make_dummy_batch(mcfg, batch_size=B, n_phones=n_valid)
    per = T // n_valid
    rem = T - per * n_valid
    dur = np.zeros((B, P), np.int32)
    dur[:, :n_valid] = per
    dur[:, :rem] += 1
    batch["duration"] = dur
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = create_train_state(model, tcfg, jax.random.PRNGKey(0), batch)
    params = state.params
    key = jax.random.PRNGKey(1)

    def consume(tree):
        return sum(
            l.ravel()[0].astype(jnp.float32)
            for l in jax.tree_util.tree_leaves(tree)
        ) * 1e-30

    def time_mode(label, split):
        # the flag is read at TRACE time; fresh jitted closures per mode
        os.environ["LFS2_ATTN_SPLIT_BWD"] = "1" if split else "0"

        def body(c, i):
            grads, _ = jax.grad(_loss_fn, has_aux=True)(
                params, model, tcfg, batch,
                jax.random.fold_in(key, i + c.astype(jnp.int32)),
                True, ())
            return c + consume(grads)

        @jax.jit
        def prog(c0):
            c, _ = jax.lax.scan(
                lambda c, i: (body(c, i), None), c0, jnp.arange(ITERS))
            return c

        try:
            float(jnp.sum(prog(jnp.zeros(()))))  # compile
        except Exception as e:  # pylint: disable=broad-except
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return None
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            float(jnp.sum(prog(jnp.zeros(()))))
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            best = ms if best is None else min(best, ms)
        print(f"{label}: grad {best:7.3f} ms/step")
        return best

    fused = time_mode("fused backward (default)", split=False)
    split = time_mode("split dQ + k-major dK/dV", split=True)
    if fused and split:
        print(f"delta: split is {split - fused:+.3f} ms "
              f"({(split / fused - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
