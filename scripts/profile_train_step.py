#!/usr/bin/env python
"""Attribute the flagship TRAINING step (VERDICT r2 item 6).

bench round 3: device train step = ~28.2 ms at B=8, P=256, T=2048 bf16.
This breaks it into phases, each timed as its own on-chip lax.scan
program (tunnel-free methodology of profile_flash_fwd.py):

  - loss forward (value only)
  - full grad (fwd+bwd)          -> backward = grad - forward
  - grad with flash attention off -> flash kernel's backward win
  - optimizer update alone (AdamW update + apply on fixed grads)
  - full step (grad + optimizer)  -> cross-check vs parts
  - isolated encoder / decoder / adaptor+LR fwd+bwd programs

Caveats: isolated-part sums exceed the whole (XLA fuses across
boundaries); treat parts as upper bounds and deltas as real.

Usage: [env PYTHONPATH=...] python scripts/profile_train_step.py [iters]
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

import optax

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.models import layers
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2,
    make_dummy_batch,
)
from lightningfastspeech2_tpu.train.step import (
    _loss_fn,
    create_train_state,
)

B, P, T = 8, 256, 2048
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
DTYPE = jnp.bfloat16


def _consume(tree):
    """Fold every leaf into the carry so XLA cannot dead-code-eliminate
    any part of the backward/update that produced it."""
    return sum(
        l.ravel()[0].astype(jnp.float32) for l in jax.tree_util.tree_leaves(tree)
    ) * 1e-30


def scan_time(label, body_fn, carry0, iters=ITERS):
    """One on-chip program: scan(body_fn) for `iters` steps, single host
    read. Returns ms/step."""

    @jax.jit
    def prog(c0):
        c, _ = jax.lax.scan(lambda c, i: (body_fn(c, i), None), c0,
                            jnp.arange(iters))
        return c

    float(jnp.sum(prog(carry0)))  # compile + run once
    t0 = time.perf_counter()
    float(jnp.sum(prog(carry0)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:42s} {ms:8.3f} ms")
    return ms


def main():
    print("backend:", jax.default_backend())
    cfg = C.lightspeech_flagship()
    mcfg = C.replace(cfg.model, max_phones=P, max_frames=T)
    tcfg = C.replace(cfg, model=mcfg)
    model = FastSpeech2(mcfg, dtype=DTYPE)
    n_valid = P - 16
    batch = make_dummy_batch(mcfg, batch_size=B, n_phones=n_valid)
    per = T // n_valid
    rem = T - per * n_valid
    dur = np.zeros((B, P), np.int32)
    dur[:, :n_valid] = per
    dur[:, :rem] += 1
    batch["duration"] = dur
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, optimizer = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                                          batch)
    params = state.params
    key = jax.random.PRNGKey(1)

    # ---- whole-step phases ----------------------------------------------
    def fwd_body(c, i):
        loss, _ = _loss_fn(params, model, tcfg, batch,
                           jax.random.fold_in(key, i + c.astype(jnp.int32)),
                           True, ())
        return c + loss * 1e-30

    t_fwd = scan_time("loss forward (train mode)", fwd_body, jnp.zeros(()))

    def grad_body(c, i):
        grads, _ = jax.grad(_loss_fn, has_aux=True)(
            params, model, tcfg, batch,
            jax.random.fold_in(key, i + c.astype(jnp.int32)), True, ())
        return c + _consume(grads)

    t_grad = scan_time("grad (fwd+bwd)", grad_body, jnp.zeros(()))

    grads0, _ = jax.jit(jax.grad(_loss_fn, has_aux=True),
                        static_argnums=(1, 2, 5, 6))(
        params, model, tcfg, batch, key, True, ())

    def opt_body(c, i):
        g = jax.tree_util.tree_map(lambda x: x + c * 1e-30, grads0)
        updates, _ = optimizer.update(g, state.opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return c + _consume(p2)

    t_opt = scan_time("optimizer (AdamW update + apply)", opt_body,
                      jnp.zeros(()))

    def step_body(c, i):
        grads, _ = jax.grad(_loss_fn, has_aux=True)(
            params, model, tcfg, batch,
            jax.random.fold_in(key, i + c.astype(jnp.int32)), True, ())
        updates, _ = optimizer.update(grads, state.opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return c + _consume(p2)

    t_step = scan_time("full step (grad + optimizer)", step_body,
                       jnp.zeros(()))
    print(f"{'  -> backward (grad - forward)':42s} {t_grad - t_fwd:8.3f} ms")
    print(f"{'  -> parts sum (grad + opt)':42s} {t_grad + t_opt:8.3f} ms "
          f"(vs full {t_step:.3f})")

    # ---- flash attention contribution -----------------------------------
    os.environ["LFS2_USE_PALLAS"] = "0"
    from lightningfastspeech2_tpu.ops import kernel_gate

    kernel_gate.reset_cache()

    def grad_noflash_body(c, i):
        grads, _ = jax.grad(_loss_fn, has_aux=True)(
            params, model, tcfg, batch,
            jax.random.fold_in(key, i + c.astype(jnp.int32)), True, ())
        return c + _consume(grads)

    t_grad_noflash = scan_time("grad, flash attention OFF",
                               grad_noflash_body, jnp.zeros(()))
    os.environ.pop("LFS2_USE_PALLAS", None)
    kernel_gate.reset_cache()
    print(f"{'  -> flash bwd win':42s} {t_grad_noflash - t_grad:8.3f} ms")

    # ---- isolated sub-model fwd+bwd programs -----------------------------
    rng = jax.random.PRNGKey(2)
    xT = jax.random.normal(rng, (B, T, mcfg.decoder.hidden), DTYPE)
    xP = jax.random.normal(rng, (B, P, mcfg.encoder.hidden), DTYPE)
    maskT = jnp.ones((B, T), bool)
    maskP = jnp.ones((B, P), bool)

    def stack_grad(label, stack_cfg, x, mask):
        stack = layers.FFTStack(stack_cfg, DTYPE)
        p = stack.init({"params": jax.random.PRNGKey(3),
                        "dropout": jax.random.PRNGKey(4)},
                       x, mask, False)

        def loss(pp, xx, i):
            out = stack.apply(pp, xx, mask, False,
                              rngs={"dropout": jax.random.fold_in(key, i)})
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        def body(c, i):
            g = jax.grad(loss)(p, x + c * 1e-30, i)
            return c + _consume(g)

        return scan_time(label, body, jnp.zeros(()))

    stack_grad("encoder fwd+bwd (P=256)", mcfg.encoder, xP, maskP)
    stack_grad("decoder fwd+bwd (T=2048)", mcfg.decoder, xT, maskT)

    # length regulator fwd+bwd
    from lightningfastspeech2_tpu.ops.length_regulator import regulate

    dur_j = jnp.asarray(dur)

    def lr_loss(xx):
        out, _ = regulate(xx, dur_j, T)
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    def lr_body(c, i):
        g = jax.grad(lr_loss)(xP + c * 1e-30)
        return c + g[0, 0, 0].astype(jnp.float32) * 1e-30

    scan_time("length-regulate fwd+bwd", lr_body, jnp.zeros(()))


if __name__ == "__main__":
    main()
