"""Retune knn_pallas_exact's tile knobs on the real chip (the parity
mode's 1.35M pts/s rode the defaults chosen before the HIGHEST-precision
fix; the 6x-pass dot may shift the optimum).

Method: precise standalone sweep (exp_stage_sweep_precise.py pattern) —
compile every candidate FIRST, then time reps-in-jit in interleaved
rounds so device drift cannot masquerade as a config delta.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_blocks
from dgcnn_tpu.kernels.knn_pallas import knn_pallas_exact

x = jnp.asarray(make_blocks()[..., :3])
K = 30
REPS = 8

CANDS = [
    # (band, n_win, cap, query_tile)
    (2048, 64, 8, 512),    # current default
    (2048, 64, 8, 256),
    (2048, 64, 8, 128),
    (2048, 32, 8, 512),
    (2048, 64, 6, 512),
    (2048, 128, 8, 512),
    (1024, 64, 8, 512),
    (3072, 64, 8, 384),
]


def make(cand):
    band, n_win, cap, qt = cand

    @jax.jit
    def reps(x):
        acc = jnp.int32(0)
        for _ in range(REPS):
            acc = acc + knn_pallas_exact(
                x, K, band=band, n_win=n_win, cap=cap,
                query_tile=qt)[0, 0, 0]
        return acc

    return reps

fns = {c: make(c) for c in CANDS}
ok = {}
for c, f in fns.items():
    try:
        float(f(x))   # compile + warm
        ok[c] = f
    except Exception as e:  # noqa: BLE001
        print(f"{c}: FAILED compile/run: {type(e).__name__}: {e}")

times = {c: [] for c in ok}
for rnd in range(5):
    for c, f in ok.items():
        t0 = time.perf_counter()
        float(f(x))
        times[c].append((time.perf_counter() - t0) / REPS)
for c in ok:
    ts = sorted(times[c])
    print(f"band={c[0]:5d} n_win={c[1]:3d} cap={c[2]} qt={c[3]:3d}: "
          f"{ts[len(ts)//2]*1e3:6.2f} ms/call "
          f"[{ts[0]*1e3:.2f}..{ts[-1]*1e3:.2f}]")


# ---- full-width (feature-stage) exact kNN: the dominant cost of the
# exact forward (stages 2-3 run band=0 at C=64). Sweep extraction shape.
print("\nfull-width feature-table sweep (band=0, C=64):")
rngf = np.random.default_rng(1)
feat = jnp.asarray(rngf.normal(size=(8, 7000, 64)).astype(np.float32))

FCANDS = [
    # (n_win, cap, query_tile)
    (64, 8, 512),    # current default resolution
    (64, 8, 256),
    (64, 8, 128),
    (32, 8, 256),
    (128, 8, 256),
    (64, 6, 256),
]


def make_f(cand):
    n_win, cap, qt = cand

    @jax.jit
    def reps(t):
        acc = jnp.int32(0)
        for _ in range(REPS):
            acc = acc + knn_pallas_exact(
                t, K, band=0, n_win=n_win, cap=cap,
                query_tile=qt)[0, 0, 0]
        return acc

    return reps

fns_f = {}
for c in FCANDS:
    f = make_f(c)
    try:
        float(f(feat))
        fns_f[c] = f
    except Exception as e:  # noqa: BLE001
        print(f"{c}: FAILED: {type(e).__name__}: {e}")

times_f = {c: [] for c in fns_f}
for rnd in range(5):
    for c, f in fns_f.items():
        t0 = time.perf_counter()
        float(f(feat))
        times_f[c].append((time.perf_counter() - t0) / REPS)
for c in fns_f:
    ts = sorted(times_f[c])
    print(f"n_win={c[0]:3d} cap={c[1]} qt={c[2]:3d}: "
          f"{ts[len(ts)//2]*1e3:6.2f} ms/call "
          f"[{ts[0]*1e3:.2f}..{ts[-1]*1e3:.2f}]")
