"""Batch-scaling after the round-2 backward optimizations + parity-mode
cost at the production batch. Run on TPU."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.utils.profiling import measure, roundtrip_seconds

N, K = 7000, 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def step_time(b, remat):
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl="approx")
    tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
    st = init_train_state(jax.random.key(0), cfg, tx)
    step = make_train_step(cfg, tx, donate=True, remat=remat)
    pts = jax.random.normal(jax.random.key(1), (b, N, 4))
    labels = jax.random.randint(jax.random.key(2), (b, N), 0, 5)
    mask = jnp.ones((b, N))
    st, m = step(st, pts, labels, mask)
    _ = float(m["loss"])
    rt = roundtrip_seconds()
    t0 = time.perf_counter()
    for _ in range(5):
        st, m = step(st, pts, labels, mask)
        _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 5 - rt
    return dt * 1e3, b * N / dt


def main():
    log(f"backend: {jax.default_backend()}")
    for b in (8, 16, 32):
        for remat in (False, "selective"):
            try:
                ms_, pps = step_time(b, remat)
                log(f"train B={b:2d} remat={str(remat):9s}: {ms_:7.1f} ms "
                    f"= {pps:,.0f} pts/s")
            except Exception as e:
                log(f"train B={b:2d} remat={str(remat):9s}: FAILED "
                    f"{type(e).__name__}: {str(e)[:150]}")

    # parity-mode (matmul_precision=highest) eval cost at B=8
    for prec in (None, "highest"):
        cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                          knn_impl="pallas_packed", matmul_precision=prec)
        params, state = init_dgcnn(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (8, N, 4))
        fwd = jax.jit(
            lambda p, s, v: jnp.sum(apply_dgcnn(p, s, v, cfg)[0]))
        t = measure(fwd, params, state, x, iters=6)["sec_per_call"] * 1e3
        log(f"eval B=8 packed precision={prec}: {t:6.1f} ms "
            f"= {8*N/t*1e3:,.0f} pts/s")
    print("EXP DONE")


if __name__ == "__main__":
    main()
