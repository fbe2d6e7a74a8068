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

import functools
import os


def _mode() -> str:
    return os.environ.get("LFS2_USE_PALLAS", "auto").lower()


@functools.lru_cache(maxsize=None)
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


@functools.lru_cache(maxsize=None)
def pallas_interpret() -> bool:
    """True when kernels should run in interpret mode (forced-on CPU)."""
    if not pallas_enabled():
        return False
    import jax

    return jax.default_backend() == "cpu"


def _probe() -> bool:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    try:
        x = jnp.ones((8, 128), jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
        )(x)
        return bool(np.asarray(out)[0, 0] == 2.0)
    except Exception:
        return False


def reset_cache() -> None:
    """Re-read the env var / re-probe (tests only)."""
    pallas_enabled.cache_clear()
    pallas_interpret.cache_clear()
