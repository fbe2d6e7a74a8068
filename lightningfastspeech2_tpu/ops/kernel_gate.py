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

NOTE: this flag — like ``LFS2_FUSED_FFN`` and ``LFS2_PALLAS_LR`` — is
read at TRACE time, and ``jax.jit`` caches do not key on env vars.
Flipping a flag after a function has compiled silently keeps the old
path within that compiled function; set the flags before the first
trace (or rebuild the jitted closure, as bench.py's fail-soft retry
does). ``reset_cache()`` clears the probe state for tests.
"""

from __future__ import annotations

import logging
import os
import threading

_log = logging.getLogger(__name__)


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
_probe_lock = threading.Lock()


def _is_backend_failure(e: Exception) -> bool:
    """Distinguish 'this backend cannot run Mosaic kernels' (cache False
    immediately) from transient trace-context/dispatch errors (retry a
    few times before giving up)."""
    text = f"{type(e).__name__}: {e}".lower()
    for marker in (
        "unimplemented", "not supported", "unsupported", "no registered",
        "mosaic", "unavailable", "does not support",
    ):
        if marker in text:
            return True
    return False


def _probe() -> bool:
    """Probe the live backend with a tiny kernel, ONCE.

    The gate is usually first consulted while TRACING a jitted model
    (flax modules decide their compute path at trace time), so the probe
    runs under ``jax.ensure_compile_time_eval()`` — without it the eager
    dispatch raises inside the trace, and an lru_cache here used to
    poison the answer to False for the whole process, silently disabling
    every Pallas kernel in jit-first programs (found: round-2 bench
    forwards never ran the fused kernels they claimed to gate in).
    Backend-capability failures are cached immediately; transient errors
    only stick after several attempts, so one bad context can't poison
    the process. State is guarded by a lock — the gate can be consulted
    from concurrent traces."""
    global _probe_result, _probe_failures
    if _probe_result is not None:  # racy fast path, settled value is final
        return _probe_result

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    with _probe_lock:
        if _probe_result is not None:
            return _probe_result
        try:
            with jax.ensure_compile_time_eval():
                x = jnp.ones((8, 128), jnp.float32)
                out = pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
                )(x)
                ok = bool(np.asarray(out)[0, 0] == 2.0)
            _probe_result = ok
            if not ok:
                _log.warning(
                    "Pallas probe returned wrong value; kernels disabled"
                )
            return ok
        except Exception as e:  # pylint: disable=broad-except
            _probe_failures += 1
            if _is_backend_failure(e) or _probe_failures >= 5:
                _probe_result = False
                _log.warning(
                    "Pallas kernels disabled for this backend after %d "
                    "probe failure(s): %s: %s",
                    _probe_failures, type(e).__name__, e,
                )
            return False


def reset_cache() -> None:
    """Re-read the env var / re-probe (tests and bench fallback)."""
    global _probe_result, _probe_failures
    with _probe_lock:
        _probe_result = None
        _probe_failures = 0
