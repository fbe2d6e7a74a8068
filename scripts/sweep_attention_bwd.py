#!/usr/bin/env python
"""Sweep the flash-attention backward query tile (VERDICT r2 item 6 tail).

With the FFN half fused, the attention backward is the largest single
Pallas phase left in the 24.5 ms train step (flash bwd win 6.6 ms vs
XLA). The bwd tile was set to 256 by the VMEM budget; this sweeps the
remaining legal sizes on the full training grad to see whether 128 (or
512 where it fits) schedules better, using the tunnel-free on-chip scan
methodology.

Usage: python scripts/sweep_attention_bwd.py [iters]
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
from lightningfastspeech2_tpu.ops import pallas_attention as pa
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

    def time_tile(tile):
        if T % tile != 0:
            # the bwd grid is T // Tq with no tail masking: a
            # non-dividing tile silently skips the last T % tile query
            # rows, returning garbage dq there and a fake speedup (the
            # first 384 sweep "won" by 3.5% ~= the 6.25% of rows it
            # dropped, partially offset by fixed costs)
            print(f"tile {tile:4d}: SKIPPED (does not divide T={T}; "
                  f"grid would drop {T % tile} query rows)")
            return
        orig = pa._pick_bwd_q_tile
        pa._pick_bwd_q_tile = lambda t: tile
        try:
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
                float(jnp.sum(prog(jnp.zeros(()))))
            except Exception as e:
                print(f"tile {tile:4d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")
                return
            t0 = time.perf_counter()
            float(jnp.sum(prog(jnp.zeros(()))))
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"tile {tile:4d}: grad {ms:7.3f} ms")
        finally:
            pa._pick_bwd_q_tile = orig

    tiles = (
        tuple(int(t) for t in sys.argv[2:]) if len(sys.argv) > 2
        else (128, 256, 512)
    )
    for tile in tiles:
        time_tile(tile)


if __name__ == "__main__":
    main()
