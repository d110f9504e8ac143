"""Measure the scatter-add accumulator-copies knob (breaks the serial
same-address RMW chain) at the train-step shape, plus chunk size, and the
effect on the full train step.

Run ONCE in a background process:
    python scripts/exp_scatter_copies.py > /tmp/exp_scatter.log 2>&1
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

B, N, K, C = 8, 7000, 30, 64


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    m = N * K
    dy = jnp.asarray(rng.normal(size=(B, m, C)).astype(np.float32))
    # LiDAR-like locality: targets near the source query index
    q = np.repeat(np.arange(N), K)[None, :].repeat(B, 0)
    idx = np.clip(q + rng.integers(-300, 300, (B, m)), 0, N - 1)
    idx = jnp.asarray(idx.astype(np.int32))

    ref = None
    REPS = 6

    for copies in (1, 2, 4, 8):
        for chunk in (2048,) if copies > 1 else (2048,):
            fn = functools.partial(
                scatter_add_rows, n=N, chunk=chunk, copies=copies)

            @jax.jit
            def many(dy, idx):
                acc = jnp.float32(0)
                for j in range(REPS):
                    out = fn(dy + jnp.float32(j), idx)
                    acc = acc + out[0, 0, 0]
                return acc

            try:
                float(many(dy, idx))
                out = np.asarray(fn(dy, idx))
                if ref is None:
                    ref = np.asarray(
                        jnp.zeros((B, N, C))
                        .at[jnp.arange(B)[:, None], idx].add(dy))
                err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1)
                float(many(dy, idx))
                t0 = time.perf_counter()
                n_outer = 3
                for _ in range(n_outer):
                    float(many(dy, idx))
                per = (time.perf_counter() - t0) / (n_outer * REPS)
                log(f"copies={copies} chunk={chunk}: {per*1e3:.2f} ms "
                    f"(rel err {err:.1e})")
            except Exception as e:
                log(f"copies={copies} chunk={chunk}: FAILED "
                    f"{type(e).__name__}: {str(e)[:160]}")

    # C=4 stage-1 shape
    dy4 = jnp.asarray(rng.normal(size=(B, m, 4)).astype(np.float32))
    for copies in (1, 4):
        fn = functools.partial(scatter_add_rows, n=N, copies=copies)

        @jax.jit
        def many4(dy, idx):
            acc = jnp.float32(0)
            for j in range(REPS):
                acc = acc + fn(dy + jnp.float32(j), idx)[0, 0, 0]
            return acc

        try:
            float(many4(dy4, idx)); float(many4(dy4, idx))
            t0 = time.perf_counter()
            for _ in range(3):
                float(many4(dy4, idx))
            per = (time.perf_counter() - t0) / (3 * REPS)
            log(f"C=4 copies={copies}: {per*1e3:.2f} ms")
        except Exception as e:
            log(f"C=4 copies={copies}: FAILED {type(e).__name__}: {str(e)[:160]}")

    log("done")


if __name__ == "__main__":
    main()
