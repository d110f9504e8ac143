"""Compile-time vs runtime sweep of the capped packed-kNN kernel's loop
structure (unroll_cap, unroll_merge):

  (0,0) full python unroll  — fastest measured steady state, but the cap
        body touches the full (n_win, window, qt) tile so instruction
        count scales with cap -> minutes of Mosaic compile in big programs
  (1,1) full fori           — fast compile, measured +2 ms/call
  (1,0)/(2,0)/(4,0) hybrids — fori cap loop (bounded instructions) with
        the cheap small-tile merge unrolled

Run ONCE in a background process (TPU claim handoff is slow):
    python scripts/exp_capped_unroll.py > /tmp/exp_unroll.log 2>&1
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import knn_pallas

B, N, K = 8, 7000, 30


def log(*a):
    print(*a, flush=True)


def make_x():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 30, (B, N, 3)).astype(np.float32)
    x = np.stack([xi[np.argsort(xi[:, 0])] for xi in x])
    x[..., 2] = rng.uniform(0, 5, (B, N))
    return jnp.asarray(x)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    x3 = make_x()
    # claim the device + warm the Mosaic path on a tiny flat-packed call
    float(jnp.sum(knn_pallas(x3[:1, :512], 8, packed=True)[..., 0]))
    log("device claimed + mosaic warm")

    import functools
    REPS = 8

    def run(uc, um):
        fn = functools.partial(knn_pallas, k=K, packed=True, cap=8,
                               window=256, unroll_cap=uc, unroll_merge=um)

        @jax.jit
        def many(x):
            acc = jnp.int32(0)
            for j in range(REPS):
                idx = fn(x + jnp.float32(j) * 1e-6)
                acc = acc + idx[0, 0, 0]
            return acc

        t0 = time.perf_counter()
        float(many(x3))
        compile_s = time.perf_counter() - t0
        float(many(x3))
        t0 = time.perf_counter()
        n_outer = 3
        for _ in range(n_outer):
            float(many(x3))
        per_call = (time.perf_counter() - t0) / (n_outer * REPS)
        out = np.asarray(fn(x3))
        return compile_s, per_call, out

    ref = None
    for uc, um in [(1, 0), (0, 0), (1, 1), (2, 0), (4, 0), (0, 1)]:
        try:
            compile_s, per_call, out = run(uc, um)
        except Exception as e:
            log(f"uc={uc} um={um}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        note = ""
        if ref is None:
            ref = out
        else:
            rows = int((out != ref).any(-1).sum())
            note = f" (rows!=first: {rows}/{out.shape[0]*out.shape[1]})"
        log(f"uc={uc} um={um}: compile {compile_s:.1f} s, "
            f"{per_call*1e3:.2f} ms/call{note}")
    log("done")


if __name__ == "__main__":
    main()
