"""Profiling and timing (SURVEY.md §5: the reference wires in none).

* :func:`trace` — context manager around ``jax.profiler`` writing an XProf/
  Perfetto trace directory;
* :class:`StepTimer` — wall-clock step timing with proper device sync
  (scalar pull — ``block_until_ready`` alone can return early on tunnelled
  platforms, see bench.py) and round-trip subtraction;
* :func:`measure` — one-line sync-aware timing of a jitted callable.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(tree) -> float:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0]))


def roundtrip_seconds(iters: int = 10) -> float:
    """Host<->device round-trip latency via a trivial kernel."""
    f = jax.jit(lambda a: jnp.sum(a))
    a = jnp.ones((8, 128))
    _sync(f(a))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(f(a))
    return (time.perf_counter() - t0) / iters


def measure(fn, *args, iters: int = 5, warmup: int = 1,
            subtract_roundtrip: bool = True) -> dict:
    """Time ``fn(*args)`` with per-iteration device sync.

    Returns {'sec_per_call', 'compile_s', 'roundtrip_s'}.
    """
    t0 = time.perf_counter()
    _sync(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        _sync(fn(*args))
    rt = roundtrip_seconds() if subtract_roundtrip else 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    per = max((time.perf_counter() - t0) / iters - rt, 0.0)
    return {"sec_per_call": per, "compile_s": compile_s, "roundtrip_s": rt}


class StepTimer:
    """Accumulates step wall-times; reports mean/p50/p95."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        import numpy as np

        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
        }
