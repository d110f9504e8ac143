"""Round-3: (1) serve pipeline throughput A/B; (2) bf16 train step re-check.

1. serve_directory with the one-slot tile prefetch pipeline vs serial
   classify_file over the same 6x400k-pt tiles (warm device programs,
   restore cache active). The pipeline overlaps tile i+1's load stage
   (decode + noise + assembly, ~0.15-0.2 s) with tile i's device work.
2. train step at the bench config, compute_dtype f32 vs bfloat16 —
   round 2 measured bf16 neutral at the then-190 ms memory-bound step
   (DESIGN.md:118); the fused-VJP step is 80 ms with a larger matmul
   fraction, so re-measure.

Run ONCE in a background process:
    python scripts/exp_serve_bf16.py > /tmp/exp_serve_bf16.log 2>&1
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


log("backend:", jax.default_backend(), jax.devices()[0].device_kind)

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8


def make_tile(path, seed, n=400_000):
    from dgcnn_tpu.io.las import write_las

    rng = np.random.default_rng(seed)
    xy = rng.random((n, 2)) * 100
    z = 0.03 * xy[:, 0] + rng.normal(0, 0.05, n)
    veg = rng.random(n) < 0.3
    z[veg] += rng.random(int(veg.sum())) * 12
    write_las(path, xy[:, 0] + 5e5, xy[:, 1] + 6e6, z,
              rng.integers(0, 5, n))


def serve_ab():
    import tempfile

    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.serve.service import PredictService, serve_directory
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer

    tmp = tempfile.mkdtemp()
    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="approx")
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(os.path.join(tmp, "m.npz"), state, epoch=0, mBPCA=0.0)
    in_dir = os.path.join(tmp, "in")
    os.makedirs(in_dir)
    n_tiles = 6
    for i in range(n_tiles):
        make_tile(os.path.join(in_dir, f"tile_{i}.las"), seed=i)
    svc = PredictService(
        K, num_points=N, block_size=30.0, num_classes=C, num_features=F,
        emb_dims=EMB, model_label="m", model_root=tmp,
        knn_impl="pallas_capped", batch_size=B,
    )
    # warm: classify tile_0 once (compiles + restore cache)
    warm_out = os.path.join(tmp, "warm")
    os.makedirs(warm_out)
    t0 = time.perf_counter()
    svc.classify_file(os.path.join(in_dir, "tile_0.las"),
                      os.path.join(warm_out, "tile_0.las"))
    log(f"warm-up classify (compile): {time.perf_counter()-t0:.1f} s")

    # A: serial classify_file (no pipeline)
    out_a = os.path.join(tmp, "out_serial")
    os.makedirs(out_a)
    t0 = time.perf_counter()
    for i in range(n_tiles):
        svc.classify_file(os.path.join(in_dir, f"tile_{i}.las"),
                          os.path.join(out_a, f"tile_{i}.las"))
    dt_a = time.perf_counter() - t0
    log(f"serial: {dt_a:.2f} s for {n_tiles} tiles "
        f"({n_tiles/dt_a:.2f} tiles/s)")

    # B: pipelined serve_directory
    out_b = os.path.join(tmp, "out_piped")
    t0 = time.perf_counter()
    done = serve_directory(svc, in_dir, out_b, once=True, settle_s=0.0)
    dt_b = time.perf_counter() - t0
    log(f"piped serve_directory: {dt_b:.2f} s for {done} tiles "
        f"({done/dt_b:.2f} tiles/s)  speedup x{dt_a/dt_b:.2f}")
    # outputs must match the serial run bit-for-bit
    for i in range(n_tiles):
        a = open(os.path.join(out_a, f"tile_{i}.las"), "rb").read()
        b = open(os.path.join(out_b, f"tile_{i}.las"), "rb").read()
        assert a == b, f"tile_{i} output mismatch"
    log("piped outputs == serial outputs (bit-exact)")


def train_ab():
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import (
        init_train_state, make_optimizer, make_train_step,
    )
    from dgcnn_tpu.utils.profiling import roundtrip_seconds

    rng = np.random.default_rng(0)
    # x-sorted synthetic blocks, the bench workload shape
    xs = np.sort(rng.random((B, N, 1)) * 30, axis=1).astype(np.float32)
    pts = np.concatenate(
        [xs, rng.random((B, N, F - 1)).astype(np.float32) * 8], axis=-1)
    labels_np = rng.integers(0, C, (B, N)).astype(np.int32)
    for cd in (None, "bfloat16"):
        cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                          knn_impl="pallas_capped", knn_train_unroll=True,
                          compute_dtype=cd)
        tx = make_optimizer(lr=1e-3, epochs=30, steps_per_epoch=100)
        state = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, donate=True)
        p = jnp.asarray(pts)
        labels = jnp.asarray(labels_np)
        mask = jnp.ones((B, N))
        t0 = time.perf_counter()
        state, m = step(state, p, labels, mask)
        float(m["loss"])
        compile_s = time.perf_counter() - t0
        rt = roundtrip_seconds()
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            state, m = step(state, p, labels, mask)
            float(m["loss"])
        per = (time.perf_counter() - t0) / iters - rt
        log(f"train step compute_dtype={cd}: {per*1e3:.1f} ms "
            f"({B*N/per/1e3:.0f}k pts/s, compile {compile_s:.0f}s)")


serve_ab()
train_ab()
log("DONE")
