"""Profiling & numeric-debug hooks (SURVEY.md §5 "Tracing / profiling").

The reference had only TensorBoard scalars; here:
  * `trace(logdir)` — context manager around `jax.profiler.trace` so any
    training region can be captured for the TensorBoard profile plugin.
  * `named(...)` — `jax.named_scope` re-export used by the physics steps so
    XLA traces are readable.
  * `enable_nan_checks()` — turns on jax_debug_nans (the numeric analog of
    the reference stack's nonexistent sanitizers).
"""

from __future__ import annotations

import contextlib

import jax

named = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
