"""Precise (reps-in-jit) tile sweep of the banded kNN kernels.

Companion to exp_stage_sweep_precise.py: the feature-banded kernel
(2x ~2.0 ms/forward) and stage-1 banded kernel (~1.5 ms) had their
query tiles and (cap, n_win) picked by full-forward A/B (±1.5 ms drift)
— re-sweep them standalone where 0.05 ms resolves. All candidates are
compiled FIRST, then timed in interleaved rounds so inter-minute device
drift cannot masquerade as a config difference (a first draft measured
the SAME config at 1.80-2.07 across sections). Accuracy classes of
(cap, n_win) variants were already established (exp_cap_nwin.py:
identical trained agreement); query_tile is accuracy-neutral tiling.
Mosaic fori_loop only supports unroll=1 or full — unroll_merge
candidates are {0 (python-unrolled), 1, 30}.

    python scripts/exp_knn_sweep_precise.py > /tmp/exp_knn_sweep.log 2>&1
"""

import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import _knn_banded_jit

B, N, K = 8, 7168, 30
REPS = 16


def log(*a):
    print(*a, flush=True)


def sorted_cloud(c: int, span: float = 30.0, seed: int = 0) -> jax.Array:
    rng = np.random.default_rng(seed)
    x = rng.random((B, N, c)).astype(np.float32) * span
    order = np.argsort(x[..., 0], axis=1, kind="stable")
    return jnp.asarray(np.take_along_axis(x, order[..., None], axis=1))


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    x64 = sorted_cloud(64, span=4.0, seed=0)
    x5 = sorted_cloud(5, span=30.0, seed=1)

    configs = []
    # qt must be a multiple of 128 (the output block's lane dim)
    for qt in (128, 256, 384, 512):
        configs.append((f"fb qt={qt} (8,32) um=0", x64,
                        dict(band=4096, n_win=32, cap=8, query_tile=qt)))
    for cap, nw in ((6, 64), (4, 128)):
        configs.append((f"fb qt=256 ({cap},{nw}) um=0", x64,
                        dict(band=4096, n_win=nw, cap=cap, query_tile=256)))
    for um in (1, 30):
        configs.append((f"fb qt=256 (8,32) um={um}", x64,
                        dict(band=4096, n_win=32, cap=8, query_tile=256,
                             unroll_merge=um)))
    for qt in (384, 512, 1024):
        configs.append((f"s1 qt={qt} (8,32)", x5,
                        dict(band=2048, n_win=32, cap=8, query_tile=qt)))

    # compile everything first
    fns = []
    for name, x, kw in configs:
        def make(kw):
            @jax.jit
            def many(x0):
                def body(i, carry):
                    x_, acc = carry
                    _i, keys = _knn_banded_jit(x_, K, **kw)
                    s = jnp.sum(keys[:, ::31].astype(jnp.float32)) * 1e-30
                    return (x_ + s, acc + s)

                return jax.lax.fori_loop(
                    0, REPS, body, (x0, jnp.float32(0)))[1]

            return many

        fn = make(kw)
        float(fn(x))  # compile
        fns.append((name, fn, x, []))
        log(f"compiled {name}")

    # interleaved timing rounds
    for name, fn, x, _ in fns:  # warm pass, discarded
        float(fn(x))
    for rnd in range(5):
        for name, fn, x, ts in fns:
            t0 = time.perf_counter()
            float(fn(x))
            ts.append((time.perf_counter() - t0 - rt) / REPS)
    log("--- results (median of 5 interleaved rounds) ---")
    for name, fn, x, ts in fns:
        med = statistics.median(ts) * 1e3
        log(f"{name}: {med:.2f} ms [{min(ts)*1e3:.2f}..{max(ts)*1e3:.2f}]")
    log("DONE")


if __name__ == "__main__":
    main()
