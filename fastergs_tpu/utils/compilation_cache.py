"""Persistent XLA compilation cache setup.

Cold TPU compiles of the garden-scale train step cost minutes (the wide
variadic sort alone can take >80 s on a loaded compile server); the
persistent cache makes every later process re-use the serialized
executables. The reference's analog is torch's kernel/extension caching —
here it is a one-line opt-in applied by bench.py, the CLI entry points, and
the driver hooks.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Points JAX's compilation cache at a durable directory and returns it.

    Default location: FASTERGS_CACHE_DIR env var, else `.jax_cache` next to
    the repository root (derived from this file's location).
    """
    import jax

    if path is None:
        path = os.environ.get('FASTERGS_CACHE_DIR')
    if path is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo_root, '.jax_cache')
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    # cache everything that took meaningful compile time
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    return path
