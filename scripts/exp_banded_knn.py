"""Banded stage-1 kNN on TPU: timing + certificate/agreement evidence.

All kernel timings use REPS-inside-jit (serial data dependence between
reps) so the ~25 ms tunnel round-trip cannot swamp small kernels.

Measures, at the production shape (B=8, N=7000, k=30):
  1. capped kNN at C=4 (stage-1 width) and C=64 (stage-2/3 width) — the
     per-stage forward kNN costs;
  2. banded vs capped at C=4 (band x qt sweep) + raw kernel without the
     cert/repair epilogue;
  3. certificate failure counts + agreement on uniform bench blocks AND
     realistic ALS rooms;
  4. full eval forward with knn_band=3072 vs 0, median of 5 trials.

Run ONCE in a background process:
    python scripts/exp_banded_knn.py > /tmp/exp_banded.log 2>&1
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

from dgcnn_tpu.kernels.knn_pallas import (
    _knn_banded_jit,
    knn_pallas,
    knn_pallas_banded,
)
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

B, N, K, F = 8, 7000, 30, 4
REPS = 8


def log(*a):
    print(*a, flush=True)


def time_reps(fn, x, label, iters=3):
    """Median seconds/call with REPS serial calls inside one jit."""

    @jax.jit
    def many(xx):
        acc = jnp.int32(0)
        for j in range(REPS):
            acc = acc + fn(xx + jnp.float32(j) * 1e-6)[0, 0, 0]
        return acc

    t0 = time.perf_counter()
    float(many(x))
    compile_s = time.perf_counter() - t0
    float(many(x))
    trials = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(many(x))
        trials.append((time.perf_counter() - t0) / REPS)
    trials.sort()
    med = trials[len(trials) // 2]
    log(f"{label}: {med*1e3:.2f} ms/call "
        f"[{trials[0]*1e3:.2f}..{trials[-1]*1e3:.2f}] "
        f"(compile {compile_s:.1f}s)")
    return med


def make_x(c=F, seed=0):
    from bench import make_blocks

    blocks = make_blocks(b=B, n=N, seed=seed)
    if c <= 4:
        return jnp.asarray(blocks[..., :c].copy())
    rng = np.random.default_rng(seed + 1)
    extra = rng.uniform(0, 5, (B, N, c - 4)).astype(np.float32)
    return jnp.asarray(np.concatenate([blocks, extra], -1))


def real_rooms():
    import glob

    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:8]
    blocks = []
    for f in files:
        arr = np.load(f).astype(np.float32)[:, :4]
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        blocks.append(arr[:N])
    return jnp.asarray(np.stack(blocks))


def agree(a, b):
    a, b = np.asarray(a), np.asarray(b)
    rows = (a == b).all(-1).mean()
    recall = np.mean([
        len(np.intersect1d(a[i, j], b[i, j])) / a.shape[-1]
        for i in range(a.shape[0]) for j in range(0, a.shape[1], 97)
    ])
    return rows, recall


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    import __graft_entry__ as g

    fn, args = g.entry()
    t0 = time.perf_counter()
    out = fn(*args)
    out = jax.tree_util.tree_leaves(out)[0]
    log(f"entry forward: {out.shape} {out.dtype} "
        f"(compile+run {time.perf_counter() - t0:.1f}s)")

    x4 = make_x(4)
    x64 = make_x(64)
    xr = real_rooms()

    # --- 1. capped per-width baselines ---
    capped = functools.partial(knn_pallas, k=K, packed=True, cap=8,
                               unroll_cap=0)
    time_reps(capped, x4, "capped C=4 (stage-1 width)")
    time_reps(capped, x64, "capped C=64 (stage-2/3 width)")
    time_reps(functools.partial(knn_pallas, k=K, packed=False), x4,
              "f32-exact C=4", iters=2)

    # --- 2. banded sweep at C=4 ---
    for band in (2048, 3072, 4096):
        for qt in (256, 384, 512):
            f = functools.partial(knn_pallas_banded, k=K, band=band,
                                  query_tile=qt)
            try:
                time_reps(f, x4, f"banded band={band} qt={qt}")
            except Exception as e:
                log(f"banded band={band} qt={qt}: FAILED "
                    f"{type(e).__name__}: {e}")
    fraw = functools.partial(_knn_banded_jit, k=K, band=3072, n_win=32,
                             cap=8, query_tile=384)
    time_reps(lambda xx: fraw(xx)[0], x4, "banded RAW kernel 3072/qt384")

    # banded at C=64 (feature-space widths — for the record; certificates
    # do not apply there, this is timing only)
    try:
        time_reps(functools.partial(knn_pallas_banded, k=K, band=4096),
                  x64, "banded band=4096 C=64 (timing only)")
    except Exception as e:
        log(f"banded C=64: FAILED {type(e).__name__}: {e}")

    # --- 3. certificate + agreement evidence ---
    for tag, data in (("bench blocks", x4), ("real rooms", xr)):
        _, keys = _knn_banded_jit(data, K, band=3072, n_win=32, cap=8,
                                  query_tile=384)
        banded = knn_pallas_banded(data, K, band=3072)
        cap_ = knn_pallas(data, K, packed=True, cap=8, unroll_cap=0)
        ex_ = knn_pallas(data, K, packed=False)
        rows_c, rec_c = agree(banded, cap_)
        rows_e, rec_e = agree(banded, ex_)
        from dgcnn_tpu.kernels.knn_pallas import _band_starts, _round_up
        n = data.shape[1]
        n_pad = _round_up(n, 128)
        qt, band = 384, 3072
        idx_bits = (band - 1).bit_length()
        imask = np.int32((1 << idx_bits) - 1)
        starts = np.asarray(_band_starts(_round_up(n, qt), qt, n_pad, band))
        s_q = np.repeat(starts, qt)[:n]
        x0 = np.asarray(data[..., 0], np.float32)
        xlo = np.repeat(x0[:, np.clip(starts - 1, 0, n - 1)], qt, 1)[:, :n]
        xhi = np.repeat(x0[:, np.clip(starts + band, 0, n - 1)], qt, 1)[:, :n]
        blo = np.where(s_q > 0, (x0 - xlo) ** 2, np.inf)
        bhi = np.where(s_q + band < n, (xhi - x0) ** 2, np.inf)
        s_edge = (-np.minimum(blo, bhi)).astype(np.float32)
        bits = s_edge.view(np.int32)
        ke = np.where(bits >= 0, bits, np.int32(-0x80000000) - bits) >> 1
        cert = (np.asarray(keys) & ~imask) >= ((ke & ~imask) + (1 << idx_bits))
        fails = (~cert).sum(axis=1)
        log(f"{tag}: cert fails per elem {fails.tolist()} "
            f"| agree vs capped rows {rows_c:.5f} recall {rec_c:.5f} "
            f"| vs f32-exact rows {rows_e:.5f} recall {rec_e:.5f}")

    # --- 4. full eval forward ---
    fwd_times = {}
    for band in (0, 3072):
        cfg = DGCNNConfig(num_classes=5, num_features=F, k=K, emb_dims=1024,
                          knn_impl="pallas_capped", knn_band=band)
        params, state = init_dgcnn(jax.random.key(0), cfg)

        @jax.jit
        def fwd(params, state, xx, cfg=cfg):
            return jnp.sum(apply_dgcnn(params, state, xx, cfg,
                                       train=False)[0])

        t0 = time.perf_counter()
        float(fwd(params, state, x4))
        compile_s = time.perf_counter() - t0
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(6):
                float(fwd(params, state, x4))
            trials.append((time.perf_counter() - t0) / 6)
        trials.sort()
        med = trials[2]
        fwd_times[band] = med
        log(f"forward knn_band={band}: median-of-5 {med*1e3:.2f} ms "
            f"[{trials[0]*1e3:.1f}..{trials[-1]*1e3:.1f}] "
            f"= {B*N/med:,.0f} pts/s (compile {compile_s:.1f}s)")

    # argmax agreement banded vs capped, real rooms
    cfg1 = DGCNNConfig(num_classes=5, num_features=F, k=K, emb_dims=1024,
                       knn_impl="pallas_capped", knn_band=3072)
    cfg0 = DGCNNConfig(num_classes=5, num_features=F, k=K, emb_dims=1024,
                       knn_impl="pallas_capped")
    params, state = init_dgcnn(jax.random.key(0), cfg1)

    @functools.partial(jax.jit, static_argnames="cfg")
    def logits_fn(params, state, xx, cfg):
        return apply_dgcnn(params, state, xx, cfg, train=False)[0]

    la = np.asarray(logits_fn(params, state, xr, cfg1))
    lb = np.asarray(logits_fn(params, state, xr, cfg0))
    am = (la.argmax(-1) == lb.argmax(-1)).mean()
    drift = np.abs(np.asarray(jax.nn.softmax(la, -1))
                   - np.asarray(jax.nn.softmax(lb, -1)))
    log(f"real rooms argmax agreement banded-vs-capped: {am:.6f}, "
        f"mean prob drift {np.mean(drift):.2e}, max {np.max(drift):.2e}")

    log("DONE")


if __name__ == "__main__":
    main()
