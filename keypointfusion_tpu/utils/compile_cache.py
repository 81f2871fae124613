"""Persistent XLA compilation cache.

Compiles go through a remote helper on this TPU setup and take minutes for
the full train step; the on-disk cache makes repeat runs (bench, driver
checks, resumed training) near-instant. Call once at program start."""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str = None):
    import jax
    cache_dir = cache_dir or os.environ.get(
        'KPF_COMPILE_CACHE', os.path.expanduser('~/.cache/kpf_xla'))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass  # older jax without these flags
    return cache_dir
