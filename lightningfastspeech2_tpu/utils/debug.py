"""Tracing / profiling / numerics-debug subsystem (SURVEY.md §5.1-5.2).

The reference has no in-path tracing (only dev-only line_profiler/viztracer
deps); here observability is first-class:

- ``profile_trace``: jax.profiler trace context writing TensorBoard-readable
  traces (plus optional perfetto link),
- ``annotate``: named scopes that show up in the trace timeline,
- ``nan_guard``: checkify-based NaN/Inf checking for any jitted function,
  behind a debug flag so the hot path pays nothing by default,
- ``enable_nan_debugging``: global jax_debug_nans switch,
- deterministic PRNG threading is the codebase-wide convention (explicit
  rngs everywhere); this module just hosts the knobs.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/lfs2_trace", with_perfetto: bool = False):
    """Profile everything inside the context:
    ``with profile_trace(): train_step(...)`` then point TensorBoard at
    ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=with_perfetto)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for the profiler timeline (usable as decorator or
    context manager)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def nan_guard(fn: Callable, enabled: bool | None = None) -> Callable:
    """Wrap a jittable function with checkify NaN/Inf checks. Enabled via
    the LFS2_DEBUG_NANS env var unless forced; the wrapped function raises
    with the offending primitive's location."""
    if enabled is None:
        enabled = os.environ.get("LFS2_DEBUG_NANS", "0") == "1"
    if not enabled:
        return fn

    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def xla_dump_to(path: str) -> None:
    """Route XLA HLO dumps to ``path`` (config knob per SURVEY.md §5.1);
    must be called before the first compilation."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={path}"
    ).strip()
