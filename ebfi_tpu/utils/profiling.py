"""Profiling & compile-cache helpers.

- :func:`enable_compile_cache` — persistent XLA compile cache (first
  compiles on TPU are 20-40s; cached reruns are near-instant).
- :func:`trace` — context manager around `jax.profiler` producing a
  TensorBoard-viewable device trace (the reference had wall-clock timers
  only; SURVEY.md §5 tracing).
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


def enable_compile_cache(path: Optional[str] = None) -> None:
    import jax

    path = path or os.environ.get(
        "EBFI_COMPILE_CACHE", os.path.expanduser("~/.cache/ebfi_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """`with trace('out/trace'): ...` -> TensorBoard 'profile' plugin data."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
