"""Persistent XLA compilation cache.

First compiles of the full-size models take tens of seconds; the reference
pays cuDNN autotuning on every process start instead. We persist compiled
executables across processes so CLI runs / benchmarks after the first are
compile-free.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "FGT_COMPILE_CACHE", os.path.expanduser("~/.cache/fgt_tpu_xla"))


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
