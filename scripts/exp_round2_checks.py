"""Round-2 follow-up TPU checks in one process:
  1. grad-accum train step at effective B=32 (2x16) and B=64 (4x16) —
     the flat B=32 program crashes the remote-compile helper; the scanned
     micro-batch program must compile and give linear-ish throughput.
  2. scatter copies=8 (standalone kernel — the earlier failure was inside
     an 8-rep chained program).

Run ONCE in a background process:
    python scripts/exp_round2_checks.py > /tmp/exp_checks.log 2>&1
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.utils.profiling import roundtrip_seconds

N, K = 7000, 30


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)

    for b, accum in ((32, 2), (64, 4)):
        try:
            cfg = DGCNNConfig(num_classes=5, num_features=4, k=K,
                              emb_dims=1024, knn_impl="pallas_capped")
            tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
            st = init_train_state(jax.random.key(0), cfg, tx)
            step = make_train_step(cfg, tx, donate=True, grad_accum=accum)
            xb = jax.random.normal(jax.random.key(1), (b, N, 4))
            lb = jnp.zeros((b, N), jnp.int32)
            mb = jnp.ones((b, N), jnp.float32)
            t0 = time.perf_counter()
            st, m = step(st, xb, lb, mb)
            _ = float(m["loss"])
            compile_s = time.perf_counter() - t0
            rt = roundtrip_seconds()
            t0 = time.perf_counter()
            iters = 6
            for _ in range(iters):
                st, m = step(st, xb, lb, mb)
                _ = float(m["loss"])
            dt = (time.perf_counter() - t0) / iters - rt
            log(f"train step B={b} accum={accum}: compile {compile_s:.1f} s, "
                f"{dt*1e3:.2f} ms ({b*N/dt/1e3:.0f}k pts/s)")
        except Exception as e:
            log(f"train B={b} accum={accum}: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")

    from dgcnn_tpu.kernels.scatter_pallas import scatter_add_rows

    rng = np.random.default_rng(0)
    B, C = 8, 64
    m_rows = N * K
    dy = jnp.asarray(rng.normal(size=(B, m_rows, C)).astype(np.float32))
    q = np.repeat(np.arange(N), K)[None, :].repeat(B, 0)
    idx = jnp.asarray(np.clip(q + rng.integers(-300, 300, (B, m_rows)),
                              0, N - 1).astype(np.int32))
    for copies in (4, 8):
        fn = functools.partial(scatter_add_rows, n=N, copies=copies)
        try:
            out = fn(dy, idx)
            _ = float(jnp.sum(out))
            rt = roundtrip_seconds()
            t0 = time.perf_counter()
            for _ in range(10):
                _ = float(jnp.sum(fn(dy, idx)[0, 0]))
            per = (time.perf_counter() - t0) / 10 - rt
            log(f"scatter copies={copies}: {per*1e3:.2f} ms")
        except Exception as e:
            log(f"scatter copies={copies}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
    log("done")


if __name__ == "__main__":
    main()
