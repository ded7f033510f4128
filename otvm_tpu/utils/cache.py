"""Persistent XLA compilation cache.

The joint model's conv graphs take minutes to compile through a remote
compile service; the cache turns every repeated jit (same shapes, same
code) into a millisecond disk hit, across processes and sessions.  Called
by every entry point (train/eval/bench/driver) and tests/conftest.py.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/otvm_jax_cache")


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 1.0) -> None:
    import jax

    path = cache_dir or os.environ.get("OTVM_JAX_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
