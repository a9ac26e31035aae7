"""Persistent XLA compilation cache setup.

The remote Pallas compiles on this platform cost 20-40 s each (first in a
session up to ~6 min), which made `bench all --verify` undrivable in one
window (VERDICT r2). The persistent cache is verified to work with the
axon TPU backend (entries appear on first compile; warm hits load in
seconds), so every CLI entry point enables it by default.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "lsdradixsort_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    $JAX_COMPILATION_CACHE_DIR or ~/.cache/lsdradixsort_tpu_xla).
    Idempotent; returns the directory used."""
    d = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
