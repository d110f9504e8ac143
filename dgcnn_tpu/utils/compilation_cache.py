"""Persistent XLA compilation cache for the framework entry points.

TPU compiles of the production programs cost 30-600 s (the Pallas-heavy
train/eval programs; first epoch of a training run). jax's persistent
compilation cache works through this environment's remote-compile path
(measured: forward compile 33 s -> 2.0 s on the next process), so every
CLI entry point enables it by default.

Knobs: ``DGCNN_JAX_CACHE_DIR`` overrides the location; set it empty to
disable. Library imports never touch the cache — only explicit calls from
entry points (main.py, bench.py, dgcnn_tpu.serve, scripts/*) do.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache. Returns the directory in
    use, or None when disabled (DGCNN_JAX_CACHE_DIR="") or unavailable."""
    env = os.environ.get("DGCNN_JAX_CACHE_DIR")
    if env == "":
        return None
    cache_dir = env or cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "dgcnn_tpu", "jax"
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold skips sub-second compiles; everything the
        # framework jits on TPU is well above it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir
