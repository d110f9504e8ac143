"""Sweep the capped kernel's per-window cap: cost is ~proportional to cap
(the cap passes over the full key tile are the VPU-issue bound), accuracy
is a Poisson tail P(window load > cap) with mean load k/W ~ 1.07 at the
production shape. Measures kernel ms + row agreement vs the flat packed
kernel on sorted-LiDAR data, then the forward for promising caps.

Run ONCE in a background process:
    python scripts/exp_cap_sweep.py > /tmp/exp_cap.log 2>&1
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.utils.profiling import measure

B, N, K, F = 8, 7000, 30, 4


def log(*a):
    print(*a, flush=True)


def make_x(b=B, n=N, seed=0):
    """Delegates to bench.make_blocks — ONE generator for bench and
    experiment scripts (x-sorted 30 m LiDAR-like blocks)."""
    from bench import make_blocks

    blocks = make_blocks(b=b, n=n, seed=seed)
    return jnp.asarray(blocks[..., :3].copy()), jnp.asarray(blocks)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    x3, feats = make_x()
    flat = np.asarray(knn_pallas(x3, K, packed=True))
    REPS = 8

    def time_kernel(kw):
        fn = functools.partial(knn_pallas, k=K, packed=True, window=256,
                               unroll_cap=0, **kw)

        @jax.jit
        def many(x):
            acc = jnp.int32(0)
            for j in range(REPS):
                acc = acc + fn(x + jnp.float32(j) * 1e-6)[0, 0, 0]
            return acc

        float(many(x3)); float(many(x3))
        t0 = time.perf_counter()
        for _ in range(3):
            float(many(x3))
        return (time.perf_counter() - t0) / (3 * REPS)

    for cap in (8, 7, 6, 5, 4):
        try:
            sec = time_kernel(dict(cap=cap))
        except Exception as e:
            log(f"cap={cap}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        # agreement over 4 different seeds (32 batch elements total)
        bad = tot = 0
        for seed in range(4):
            xs, _ = make_x(seed)
            fl = np.asarray(knn_pallas(xs, K, packed=True))
            cp = np.asarray(knn_pallas(xs, K, packed=True, cap=cap,
                                       window=256, unroll_cap=0))
            bad += int((cp != fl).any(-1).sum())
            tot += fl.shape[0] * fl.shape[1]
        log(f"cap={cap}: {sec*1e3:.2f} ms/call, rows!=flat {bad}/{tot}")

    for cap in (8, 6, 5):
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K,
                          knn_impl="pallas_capped", knn_cap=cap)
        try:
            params, state = init_dgcnn(jax.random.key(0), cfg)
            f = jax.jit(lambda p, s, xx, c=cfg: apply_dgcnn(p, s, xx, c)[0])
            r = measure(f, params, state, feats, iters=10, warmup=3)
            log(f"forward B=8 capped(c{cap}): {r['sec_per_call']*1e3:.2f} ms "
                f"({B*N/r['sec_per_call']/1e3:.0f}k pts/s)")
        except Exception as e:
            log(f"forward c{cap}: FAILED {type(e).__name__}: {str(e)[:160]}")
    log("done")


if __name__ == "__main__":
    main()
