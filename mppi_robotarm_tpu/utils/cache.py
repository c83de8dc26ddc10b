"""Persistent XLA compilation cache (SURVEY.md §5.1 adjacent).

First compiles of the big scan programs cost minutes in remote-compile
environments; the persistent cache makes every later process start warm.
Called by bench.py, the CLI, and the tools; a no-op if already configured.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created).

    Default: $MPPI_JAX_CACHE_DIR or ~/.cache/mppi_robotarm_tpu/xla.
    """
    import jax

    path = (path or os.environ.get("MPPI_JAX_CACHE_DIR")
            or os.path.expanduser("~/.cache/mppi_robotarm_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
