"""Persistent XLA compilation cache.

The full minimax program takes minutes to compile; caching it on disk makes
every process after the first start in seconds. Called by the CLIs,
bench.py, the Trainer constructor, and tests' conftest — but never on
IMPORT: enabling is always an explicit call, idempotent, so no module
import mutates jax global config as a side effect.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/rcot_tpu_xla") -> None:
    import jax

    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs — cache is best-effort
