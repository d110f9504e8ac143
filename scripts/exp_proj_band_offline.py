"""Offline feasibility study: CERTIFIED feature-space banding via a
1-Lipschitz projection key.

For any unit vector v, |v.(f_i - f_j)| <= ||f_i - f_j||, so rows sorted
by p = F.v admit the SAME edge-bound certificate the spatial banded
kernel uses on x (kernels/knn_pallas.py::knn_pallas_banded): a query
whose true k-th distance is below its band-edge projection gap is
PROVABLY complete — failures are repairable f32-exactly. This script
measures, on the trained soak checkpoint's real rooms (CPU):

  per feature stage (x1 feeds stage-2 kNN, x2 feeds stage-3):
    - in-band recall of the true 30-NN for row orderings
      {x-sorted (current production), PCA-1-projection-sorted}
      at bands {1024, 2048, 3072, 4096} with the kernel's per-TILE band
      placement (qt=384);
    - certificate pass rate under the projection key (kth_dist^2 vs
      squared projection gap to the nearer band edge) — the x-sorted
      ordering has NO valid feature certificate (shown for contrast as
      'spurious cert' = how often the spatial-gap bound would claim
      completeness while the projection... only the projection bound is
      sound; x-order rows get recall only).

Run on CPU:
    PALLAS_AXON_POOL_IPS= python scripts/exp_proj_band_offline.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.train.checkpoint import load_named_subtrees

N, K, QT = 7000, 30, 384
BANDS = (1024, 2048, 3072, 4096)


def log(*a):
    print(*a, flush=True)


def band_starts(n, qt, band):
    """Per-query-tile band start rows (mirrors kernels/knn_pallas.py::
    _band_starts: tile centred, clamped to [0, n-band])."""
    starts = []
    for t in range(0, n, qt):
        centre = t + qt // 2
        s = min(max(centre - band // 2, 0), max(n - band, 0))
        starts.append(s)
    return starts


def true_knn(f):
    """(N, k) exact neighbour indices + kth distance^2, numpy blocked."""
    n = f.shape[0]
    sq = np.sum(f * f, axis=1)
    idx = np.empty((n, K), np.int64)
    kth = np.empty((n,), np.float64)
    for s in range(0, n, 512):
        e = min(s + 512, n)
        d = sq[s:e, None] + sq[None, :] - 2.0 * (f[s:e] @ f.T)
        part = np.argpartition(d, K - 1, axis=1)[:, :K]
        dd = np.take_along_axis(d, part, axis=1)
        order = np.argsort(dd, axis=1, kind="stable")
        idx[s:e] = np.take_along_axis(part, order, axis=1)
        kth[s:e] = np.take_along_axis(dd, order, axis=1)[:, -1]
    return idx, np.maximum(kth, 0.0)


def pca1(f):
    """Top principal direction via power iteration (deterministic)."""
    c = f - f.mean(0)
    cov = c.T @ c
    v = np.ones(f.shape[1]) / np.sqrt(f.shape[1])
    for _ in range(50):
        v = cov @ v
        v /= np.linalg.norm(v) + 1e-30
    return v


def study(f, tag):
    n = f.shape[0]
    # ordering A: identity (rows arrive x-sorted from the pipeline)
    # ordering B: PCA-1 projection sort
    v = pca1(f)
    p = f @ v
    perm = np.argsort(p, kind="stable")
    orders = {"x-sorted": (np.arange(n), None),
              "pca-proj": (perm, p[perm])}
    t_idx, t_kth = true_knn(f)
    for oname, (order, keys) in orders.items():
        inv = np.empty(n, np.int64)
        inv[order] = np.arange(n)
        pos = inv[t_idx]              # neighbour positions in this order
        qpos = inv                    # query positions
        for band in BANDS:
            starts = band_starts(n, QT, band)
            s_of_q = np.empty(n, np.int64)
            for t, s in enumerate(starts):
                lo, hi = t * QT, min((t + 1) * QT, n)
                # positions lo..hi in SORTED order are the tile's queries
                s_of_q[lo:hi] = s
            sq = s_of_q[qpos]         # per original query: band start
            in_band = (pos >= sq[:, None]) & (pos < sq[:, None] + band)
            recall = in_band.mean()
            q_complete = in_band.all(axis=1)
            line = (f"  {tag} {oname} band={band}: recall {recall:.6f} "
                    f"complete-q {q_complete.mean():.6f}")
            if keys is not None:
                # sound certificate: kth_dist^2 < squared projection gap
                # to the nearer open band edge (inf when band touches
                # the array end on that side)
                kq = keys[qpos]
                lo_gap = np.where(sq > 0,
                                  (kq - keys[np.clip(sq - 1, 0, n - 1)])
                                  ** 2, np.inf)
                hi_edge = np.clip(sq + band, 0, n - 1)
                hi_gap = np.where(sq + band < n,
                                  (keys[hi_edge] - kq) ** 2, np.inf)
                cert = t_kth[np.arange(n)] < np.minimum(lo_gap, hi_gap)
                false_cert = cert & ~q_complete
                line += (f" cert {cert.mean():.6f} "
                         f"false-cert {false_cert.sum()}")
            log(line)


def main():
    root = "full_pipeline_run"
    import glob

    files = sorted(glob.glob(os.path.join(root, "npy", "*.npy")))[:8]
    if not files:
        log("no full_pipeline_run/npy blocks — run full_pipeline_tpu first")
        return
    blocks = []
    for fpath in files:
        arr = np.load(fpath).astype(np.float32)[:, :4]
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        blocks.append(arr[:N])
    xr = jnp.asarray(np.stack(blocks))
    cfg = DGCNNConfig(num_classes=3, num_features=4, k=K, emb_dims=1024,
                      knn_impl="xla")
    p_tpl, s_tpl = init_dgcnn(jax.random.key(0), cfg)
    sub = load_named_subtrees(os.path.join(root, "ckpt/dgcnn_model.npz"),
                              {"params": p_tpl, "bn_state": s_tpl})
    params, state = sub["params"], sub["bn_state"]

    taps = {}
    for d, name in ((1, "x1(stage2-knn-input)"), (2, "x2(stage3-knn-input)")):
        tap, _ = apply_dgcnn(params, state, xr, cfg, train=False, depth=d,
                             with_logits=False)
        taps[name] = np.asarray(tap)
        log(f"{name}: {tap.shape}")

    for name, t in taps.items():
        for bi in range(min(4, t.shape[0])):
            study(t[bi], f"{name} blk{bi}")
    log("DONE")


if __name__ == "__main__":
    main()
