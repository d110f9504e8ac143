"""Test whether jax's persistent compilation cache works through the
axon remote-compile path. Run TWICE back to back:

    python scripts/exp_compile_cache.py && python scripts/exp_compile_cache.py

If run 2's compile times collapse, wire the cache dir into the train/eval
entry points (makes the 30-600 s TPU compiles one-time-ever, and the
python-unrolled capped kernel viable for training)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dgcnn_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.kernels.knn_pallas import knn_pallas
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 30, (8, 7000, 3)).astype(np.float32))

    t0 = time.perf_counter()
    out = knn_pallas(x, 30, packed=True, cap=8, window=256, unroll_cap=0)
    _ = float(jnp.sum(out[..., 0]))
    log(f"capped kernel (unrolled) compile+run: "
        f"{time.perf_counter()-t0:.1f} s")

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=30, emb_dims=1024,
                      knn_impl="pallas_capped")
    params, state = init_dgcnn(jax.random.key(0), cfg)
    feats = jnp.asarray(rng.uniform(0, 5, (8, 7000, 4)).astype(np.float32))
    f = jax.jit(lambda p, s, xx: jnp.sum(apply_dgcnn(p, s, xx, cfg)[0]))
    t0 = time.perf_counter()
    _ = float(f(params, state, feats))
    log(f"forward compile+run: {time.perf_counter()-t0:.1f} s")
    log("done")


if __name__ == "__main__":
    main()
