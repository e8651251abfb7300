"""Persistent XLA compilation cache.

Full-shape DGCNN compiles take minutes through the remote-TPU relay;
caching them makes every run after the first start in seconds. Called
from the CLI, bench, and graft entry points (not on library import).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("MLSP_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or unsupported backend: cache is best-effort
