"""Persistent XLA compilation cache setup.

Every entry point (train/generate CLIs, bench, driver entry) funnels
through here: first TPU compiles through the remote backend take minutes,
cached reruns take seconds. This JAX build does NOT honor the
``JAX_COMPILATION_CACHE_DIR`` environment variable by itself (the config
default stays ``None``), so the cache must be enabled programmatically.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/jax_cache"


def enable_fast_prng() -> None:
    """Switch the default PRNG to the TPU hardware generator ('rbg').

    The default threefry2x32 computes random bits on the VPU — measured
    +18.7 ms per train step at B=8, T=2048 just for dropout masks; rbg
    cuts that to +6 ms. Streams change (different random numbers, same
    statistics), which is fine for dropout/noise draws.
    """
    import jax

    try:
        if jax.config.jax_default_prng_impl != "rbg":
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:
        pass


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotent; safe to call before or after backend initialization."""
    import jax

    path = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT_DIR)
    try:
        if jax.config.jax_compilation_cache_dir != path:
            jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # non-fatal: cache is an optimization only
