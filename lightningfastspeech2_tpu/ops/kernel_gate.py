"""Central switch for the Pallas kernel library.

The repo ships Mosaic kernels (length regulator, flash attention) with
XLA fallbacks.  Whether Mosaic actually compiles depends on the backend:
direct-attached TPUs work, CPU only supports interpret mode, and some
remote-tunnel backends abort kernels outright.  Rather than hard-coding,
``pallas_enabled()`` probes the live backend once with a tiny kernel and
caches the answer.

Env override ``LFS2_USE_PALLAS``:
  - ``auto`` (default): probe the backend; off on CPU.
  - ``1``: force on.  On CPU this switches the kernels to interpret
    mode (slow, for wiring tests).
  - ``0``: force off — always the XLA fallback paths.
"""

from __future__ import annotations

import os


def _mode() -> str:
    return os.environ.get("LFS2_USE_PALLAS", "auto").lower()


def pallas_enabled() -> bool:
    mode = _mode()
    if mode in ("0", "false", "off"):
        return False
    import jax

    on_cpu = jax.default_backend() == "cpu"
    if mode in ("1", "true", "on"):
        return True
    if on_cpu:
        return False
    return _probe()


def pallas_interpret() -> bool:
    """True when kernels should run in interpret mode (forced-on CPU)."""
    if not pallas_enabled():
        return False
    import jax

    return jax.default_backend() == "cpu"


_probe_result: bool | None = None
_probe_failures = 0


def _probe() -> bool:
    """Probe the live backend with a tiny kernel, ONCE.

    The gate is usually first consulted while TRACING a jitted model
    (flax modules decide their compute path at trace time), so the probe
    runs under ``jax.ensure_compile_time_eval()`` — without it the eager
    dispatch raises inside the trace, and an lru_cache here used to
    poison the answer to False for the whole process, silently disabling
    every Pallas kernel in jit-first programs (found: round-2 bench
    forwards never ran the fused kernels they claimed to gate in). A
    failed probe is only cached after several attempts, so one bad
    context can't stick."""
    global _probe_result, _probe_failures
    if _probe_result is not None:
        return _probe_result

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    try:
        with jax.ensure_compile_time_eval():
            x = jnp.ones((8, 128), jnp.float32)
            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
            )(x)
            ok = bool(np.asarray(out)[0, 0] == 2.0)
        _probe_result = ok
        return ok
    except Exception:
        _probe_failures += 1
        if _probe_failures >= 5:
            _probe_result = False
        return False


def reset_cache() -> None:
    """Re-read the env var / re-probe (tests only)."""
    global _probe_result, _probe_failures
    _probe_result = None
    _probe_failures = 0
