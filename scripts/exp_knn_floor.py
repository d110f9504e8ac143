"""Phase-split the banded kNN kernel: where does ~6 ms/stage actually go?

The forward floor is ~19 ms of kNN in a ~26 ms forward (CLAUDE.md). The
(cap, n_win) sweep measured extraction-pass count FLAT (exp_cap_nwin.py),
so the wall is NOT obviously the cap passes. This study uses the kernel's
`study` ablation kwarg (kernels/knn_pallas.py::_knn_kernel_banded) to
split each stage config into phases:

    no_mm      = pack + extract + merge (matmul replaced by a broadcast)
    score_only = matmul + epilogue + one max pass
    no_extract = matmul + pack + scratch store + one max pass
    bf16_mm    = full kernel, bf16 dot operands
    None       = production kernel

Timing method: reps-in-jit (sub-ms timings through the tunnelled chip are
garbage — CLAUDE.md methodology note), data-dependency chained so XLA
cannot hoist the kernel out of the loop, rt subtracted once outside.

    python scripts/exp_knn_floor.py > /tmp/exp_knn_floor.log 2>&1
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

    def timed(x, study, **kw):
        @jax.jit
        def many(x0):
            def body(i, carry):
                x_, acc = carry
                _idx, keys = _knn_banded_jit(x_, K, study=study, **kw)
                s = jnp.sum(keys[:, ::31].astype(jnp.float32)) * 1e-30
                # chain a (numerically negligible) dependency through the
                # carry so the kernel cannot be hoisted out of the loop
                return (x_ + s, acc + s)

            return jax.lax.fori_loop(
                0, REPS, body, (x0, jnp.float32(0)))[1]

        float(many(x))          # compile
        float(many(x))          # warm discard
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(many(x))
            trials.append((time.perf_counter() - t0 - rt) / REPS)
        return statistics.median(trials) * 1e3, trials

    configs = [
        ("feature C=64 band=4096 qt=384",
         sorted_cloud(64), dict(band=4096, n_win=32, cap=8, query_tile=384)),
        ("stage-1 C=5 band=2048 qt=512",
         sorted_cloud(5), dict(band=2048, n_win=32, cap=8, query_tile=512)),
    ]
    for name, x, kw in configs:
        log(f"--- {name} ---")
        base = None
        for study in (None, "no_mm", "score_only", "no_extract", "bf16_mm",
                      None):
            med, trials = timed(x, study, **kw)
            tag = study or "FULL"
            extra = ""
            if study is None and base is None:
                base = med
            elif base is not None:
                extra = f"  (delta vs full {med - base:+.2f} ms)"
            log(f"{tag:>11}: {med:6.2f} ms  "
                f"[{min(trials)*1e3:.2f}..{max(trials)*1e3:.2f}]{extra}")

    log("DONE")


if __name__ == "__main__":
    main()
