"""Round-2 experiment 3: measure the two train-backward optimizations.

1. scatter width cost curve (is the scatter row-latency or byte bound?)
2. stage-1 gather-x-first (4-col backward scatter instead of 64)
3. selective remat (recompute k-expanded chains, save per-point residuals)
4. batch scaling with selective remat (B=16/32 were compile-failures before)

Run on TPU: python scripts/exp_bwd_opt.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import dgcnn_tpu.models.dgcnn as mdl
from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.utils.profiling import measure

B, N, K = 8, 7000, 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ms(fn, *args, iters=5):
    return measure(fn, *args, iters=iters)["sec_per_call"] * 1e3


def step_ms(cfg, batch, remat=False):
    import time

    from dgcnn_tpu.utils.profiling import roundtrip_seconds

    tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
    st = init_train_state(jax.random.key(0), cfg, tx)
    step = make_train_step(cfg, tx, donate=True, remat=remat)
    pts, labels, mask = batch
    t0 = time.perf_counter()
    st, m = step(st, pts, labels, mask)
    _ = float(m["loss"])
    compile_s = time.perf_counter() - t0
    rt = roundtrip_seconds()
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, pts, labels, mask)
        _ = float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3 - rt * 1e3, compile_s


def main():
    log(f"backend: {jax.default_backend()}")
    M = N * K
    for w in (1, 2, 4, 8, 16, 32, 64):
        dy = jax.random.normal(jax.random.key(3), (B, M, w))
        tgt = jax.random.randint(jax.random.key(4), (B, M), 0, N)

        def sc(d, t):
            out = jnp.zeros((B, N, w), d.dtype)
            return out.at[jnp.arange(B)[:, None], t].add(d)

        log(f"scatter (B,{M},{w:2d}): {ms(jax.jit(sc), dy, tgt):7.2f} ms")

    def batch(b):
        return (jax.random.normal(jax.random.key(1), (b, N, 4)),
                jax.random.randint(jax.random.key(2), (b, N), 0, 5),
                jnp.ones((b, N)))

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=K, emb_dims=1024,
                      knn_impl="approx")
    bt = batch(B)

    # baseline: disable gather_first (pre-change behaviour)
    import functools

    orig = mdl.edge_conv_linear
    mdl.edge_conv_linear = functools.partial(orig, gather_first=False)
    t, c = step_ms(cfg, bt)
    log(f"step baseline (no g1st, no remat):   {t:7.1f} ms (compile {c:.0f}s)")
    mdl.edge_conv_linear = orig

    t, c = step_ms(cfg, bt)
    log(f"step gather-first (default):         {t:7.1f} ms (compile {c:.0f}s)")
    t, c = step_ms(cfg, bt, remat="selective")
    log(f"step gather-first + selective remat: {t:7.1f} ms (compile {c:.0f}s)")
    t, c = step_ms(cfg, bt, remat=True)
    log(f"step gather-first + full remat:      {t:7.1f} ms (compile {c:.0f}s)")

    for b in (16, 32):
        try:
            t, c = step_ms(cfg, batch(b), remat="selective")
            pps = b * N / (t / 1e3)
            log(f"step B={b} selective remat:         {t:7.1f} ms "
                f"= {pps:,.0f} pts/s (compile {c:.0f}s)")
        except Exception as e:
            log(f"step B={b} selective remat: FAILED {type(e).__name__}: "
                f"{str(e)[:200]}")

    print("EXP3 DONE")


if __name__ == "__main__":
    main()
