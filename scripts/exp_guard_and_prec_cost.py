"""Reps-in-jit costs of (a) the feature-band recall guard and (b) a
hypothetical HIGHEST-precision distance dot in the production
feature-banded kernel (the middle ground between bf16x1 production
scoring and the fully exact knn_impl="pallas" mode)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import time

import numpy as np
import jax
import jax.numpy as jnp

from dgcnn_tpu.kernels.knn_pallas import (
    _knn_banded_jit,
    knn_pallas_feature_banded,
)

rng = np.random.default_rng(1)
feat = jnp.asarray(rng.normal(size=(8, 7000, 64)).astype(np.float32))
T = jnp.asarray(True)
REPS = 8


def timeit_interleaved(fns, feat, rounds=6):
    """Compile every candidate FIRST, then time them in interleaved
    rounds — sequential per-config timing drifts on the tunnelled chip
    (the r5a run of this script measured guard=512 FASTER than guard=0;
    BASELINE.md round-5). Returns {name: median ms/call}."""
    for f in fns.values():
        float(f(feat))
    times = {n: [] for n in fns}
    for _ in range(rounds):
        for n, f in fns.items():
            t0 = time.perf_counter()
            float(f(feat))
            times[n].append((time.perf_counter() - t0) / REPS)
    return {n: sorted(ts)[len(ts) // 2] * 1e3 for n, ts in times.items()}


def make_guard(n_probe):
    @jax.jit
    def reps(t):
        acc = jnp.int32(0)
        for _ in range(REPS):
            acc = acc + knn_pallas_feature_banded(
                t, 30, sorted_ok=T, band=4096, cap=6, n_win=64,
                recall_guard=n_probe)[0, 0, 0]
        return acc
    return reps


guard_ms = timeit_interleaved(
    {n: make_guard(n) for n in (0, 128, 256, 512)}, feat)
for n_probe, ms in guard_ms.items():
    print(f"feature-banded call, recall_guard={n_probe:3d}: "
          f"{ms:5.2f} ms", flush=True)


def make_raw(hi):
    @jax.jit
    def reps(t):
        acc = jnp.int32(0)
        for _ in range(REPS):
            acc = acc + _knn_banded_jit(
                t, 30, band=4096, n_win=64, cap=6, query_tile=384,
                hi_prec=hi)[0][0, 0, 0]
        return acc
    return reps


raw_ms = timeit_interleaved({hi: make_raw(hi) for hi in (False, True)},
                            feat)
for hi, ms in raw_ms.items():
    print(f"raw banded kernel, hi_prec={hi}: {ms:5.2f} ms", flush=True)
