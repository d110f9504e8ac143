"""In-step scatter knob sweep: full train-step latency for scatter
accumulator copies x chunk combos (env knobs DGCNN_SCATTER_*).

Run ONCE in a background process:
    python scripts/exp_scatter_step_sweep.py > /tmp/exp_step_sweep.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.utils.profiling import roundtrip_seconds

N, K, B = 7000, 30, 8


def log(*a):
    print(*a, flush=True)


def step_ms(copies, chunk):
    os.environ["DGCNN_SCATTER_COPIES"] = str(copies)
    os.environ["DGCNN_SCATTER_CHUNK"] = str(chunk)
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl="pallas_capped")
    tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
    st = init_train_state(jax.random.key(0), cfg, tx)
    step = make_train_step(cfg, tx, donate=True)
    xb = jax.random.normal(jax.random.key(1), (B, N, 4))
    lb = jnp.zeros((B, N), jnp.int32)
    mb = jnp.ones((B, N), jnp.float32)
    st, m = step(st, xb, lb, mb)
    _ = float(m["loss"])
    rt = roundtrip_seconds()
    t0 = time.perf_counter()
    for _ in range(8):
        st, m = step(st, xb, lb, mb)
        _ = float(m["loss"])
    return (time.perf_counter() - t0) / 8 * 1e3 - rt * 1e3


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    for copies, chunk in [(4, 2048), (8, 2048), (4, 4096), (8, 4096),
                          (2, 2048), (8, 1024)]:
        try:
            ms = step_ms(copies, chunk)
            log(f"step copies={copies} chunk={chunk}: {ms:.2f} ms "
                f"({B*N/ms:.0f}k pts/s)")
        except Exception as e:
            log(f"copies={copies} chunk={chunk}: FAILED {type(e).__name__}: "
                f"{str(e)[:160]}")
    log("done")


if __name__ == "__main__":
    main()
