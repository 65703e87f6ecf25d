"""Persistent XLA compilation cache.

TPU compiles of the full fused model run minutes (especially through remote
AOT compile services); the persistent cache makes them one-time per program
shape across processes. Call once at entry-point startup (bench, CLI, graft
entry) — never from library import side effects.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/vitiq_jax_cache")


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("VITIQ_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
