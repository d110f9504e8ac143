"""Interleaved full-forward A/B: compute_dtype='bfloat16' vs f32 at the
PRODUCTION eval config (knn_impl='pallas_capped' + banded kNN + fused
stage kernels — the r5a run of this script accidentally used the
DGCNNConfig default knn_impl='xla' and measured the XLA chain, a wash at
143.9 vs 143.7 ms; VERDICT r4 item 3 wants the fused path, where
round-4's bf16_mm kernels keep bf16 ON the fused kernels instead of
round-3's silent fallback). Reps-in-jit + interleaved rounds (the only
drift-robust method on the tunnelled chip)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_blocks
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

REPS = 6
x = jnp.asarray(make_blocks())
cfg32 = DGCNNConfig(num_classes=5, num_features=4, k=30, emb_dims=1024,
                    knn_impl="pallas_capped")
cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
params, state = init_dgcnn(jax.random.key(0), cfg32)


def make(cfg):
    @jax.jit
    def reps(p, s, xx):
        acc = jnp.float32(0)
        for _ in range(REPS):
            acc = acc + jnp.sum(
                apply_dgcnn(p, s, xx, cfg, train=False)[0][0, 0])
        return acc

    return reps


fns = {"f32": make(cfg32), "bf16": make(cfg16)}
for n, f in fns.items():
    float(f(params, state, x))      # compile + warm
times = {n: [] for n in fns}
for rnd in range(6):
    for n, f in fns.items():
        t0 = time.perf_counter()
        float(f(params, state, x))
        times[n].append((time.perf_counter() - t0) / REPS)
for n in fns:
    ts = sorted(times[n])
    print(f"eval {n:4s}: {ts[len(ts)//2]*1e3:6.2f} ms/batch "
          f"[{ts[0]*1e3:.2f}..{ts[-1]*1e3:.2f}]")

l32 = np.asarray(apply_dgcnn(params, state, x, cfg32, train=False)[0])
l16 = np.asarray(apply_dgcnn(params, state, x, cfg16, train=False)[0])
print(f"argmax agreement bf16 vs f32: "
      f"{(l32.argmax(-1) == l16.argmax(-1)).mean():.6f}")
