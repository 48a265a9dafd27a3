"""Persistent XLA compile-cache setup.

Compiles on this host go through a slow remote relay (~1-8 min for big
programs); the on-disk cache makes reruns and `--resume` restarts
near-instant. `__graft_entry__` enables it for the driver's bench/dryrun
paths; the experiment CLIs call :func:`enable_compile_cache` so multi-hour
queued runs share compiled programs across stages, seeds, and restarts.

Must run before the first backend use (CLAUDE.md gotcha: the axon
`sitecustomize` imports jax at interpreter start, but `jax.config.update`
still works until a computation materializes a backend).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax's persistent compilation cache at the repo-local dir.

    Safe to call multiple times; silently a no-op if the backend is
    already initialized with a conflicting config (jax raises) or the
    running jax lacks the option.
    """
    import jax

    path = cache_dir or os.environ.get("PDECTL_COMPILE_CACHE", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
