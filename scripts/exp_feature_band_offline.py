"""Offline feasibility: banding FEATURE-space kNN (stages 2-3) by a
1-D projection key.

The banded stage-1 kernel certifies each query against the x-sorted edge
bound because x is a coordinate: |x_q - x_edge| <= ||p_q - p_edge||.
That bound holds for ANY unit-vector projection key u: |u.(f_i - f_j)|
<= ||f_i - f_j||_2 — so sorting rows by key = f @ u admits the SAME
certificate machinery in feature space. Round-3 rejected feature banding
after measuring per-CHANNEL sort keys (recall 0.996 at band=3072); this
study asks whether a data-adaptive direction (top principal component)
localises x1/x2-space well enough to certify >= ~96% of queries (repair
budget 256/7000) at band <= 2048-3072.

Pure CPU + numpy on the TRAINED soak model's real rooms:
  PALLAS_AXON_POOL_IPS= python scripts/exp_feature_band_offline.py

Per feature space (x1 = stage-2 kNN input, x2 = stage-3 kNN input) and
key in {pca, best channel, spatial x}: neighbour recall inside the band,
certificate pass rate, worst-block repair count, for band in
{1024, 2048, 3072, 4096} with the kernel's per-tile band placement
(_band_starts).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.train.checkpoint import load_named_subtrees
from dgcnn_tpu.kernels.knn_pallas import _band_starts

B, N, K, F = 8, 7000, 30, 4


def log(*a):
    print(*a, flush=True)


def real_rooms():
    import glob

    files = sorted(glob.glob("full_pipeline_run/npy/*.npy"))[:B]
    blocks = []
    for f in files:
        arr = np.load(f).astype(np.float32)[:, :F]
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        blocks.append(arr[:N])
    return np.stack(blocks)


def exact_knn(f):
    """(N, C) -> (N, K) exact nearest rows (excluding nothing; self
    included, matching the reference's self-inclusive kNN)."""
    n2 = (f * f).sum(1)
    d = n2[:, None] + n2[None, :] - 2.0 * (f @ f.T)
    part = np.argpartition(d, K, axis=1)[:, :K]
    rowd = np.take_along_axis(d, part, 1)
    order = np.argsort(rowd, axis=1, kind="stable")
    return np.take_along_axis(part, order, 1), d


def study(tag, feats, keys, band, qt):
    """feats: (N, C); keys: (N,) the 1-Lipschitz sort key."""
    order = np.argsort(keys, kind="stable")
    f_s = feats[order]
    k_s = keys[order]
    idx_true, d = exact_knn(feats)          # in ORIGINAL order
    pos_of = np.empty(N, np.int64)
    pos_of[order] = np.arange(N)            # original row -> sorted pos

    n_pad = ((N + 127) // 128) * 128
    if n_pad <= band:
        return None
    n_q_pad = ((N + qt - 1) // qt) * qt
    starts = np.asarray(_band_starts(n_q_pad, qt, n_pad, band))
    start_q = np.repeat(starts, qt)[:N]     # per sorted query position

    # recall: fraction of true neighbours whose sorted pos is in band
    q_pos = np.arange(N)
    nb_pos = pos_of[idx_true[order]]        # (N, K) sorted-space positions
    lo = start_q[:, None]
    hi = (start_q + band)[:, None]
    inb = (nb_pos >= lo) & (nb_pos < hi)
    recall = inb.mean()

    # certificate: kth-best IN-BAND distance vs band-edge key bound
    d_s = d[order][:, order]                # sorted-space distances
    col = np.arange(N)[None, :]
    in_band_cols = (col >= start_q[:, None]) & (col < start_q[:, None] + band)
    d_band = np.where(in_band_cols, d_s, np.inf)
    dk = np.partition(d_band, K - 1, axis=1)[:, K - 1]
    lo_i = np.clip(start_q - 1, 0, N - 1)
    hi_i = np.clip(start_q + band, 0, N - 1)
    g_lo = np.where(start_q > 0, (k_s[q_pos] - k_s[lo_i]) ** 2, np.inf)
    g_hi = np.where(start_q + band < N, (k_s[hi_i] - k_s[q_pos]) ** 2, np.inf)
    bound = np.minimum(g_lo, g_hi)
    cert = dk < bound
    fails = int((~cert).sum())
    # certified rows lose a neighbour only via in-band cap overflow; the
    # certificate itself guarantees no OUT-of-band true neighbour
    missed_cert = int((~inb[cert]).sum())
    return recall, cert.mean(), fails, missed_cert


def main():
    t0 = time.time()
    cfg = DGCNNConfig(num_classes=3, num_features=F, k=K, emb_dims=1024,
                      knn_impl="xla")
    p_tpl, s_tpl = init_dgcnn(jax.random.key(0), cfg)
    sub = load_named_subtrees("full_pipeline_run/ckpt/dgcnn_model.npz",
                              {"params": p_tpl, "bn_state": s_tpl})
    params, state = sub["params"], sub["bn_state"]
    x = real_rooms()
    log(f"loaded rooms {x.shape} ({time.time()-t0:.1f}s)")

    taps = {}
    for depth, name in ((1, "x1"), (2, "x2")):
        taps[name] = np.asarray(
            apply_dgcnn(params, state, jnp.asarray(x), cfg, train=False,
                        depth=depth)[0]
        )
        log(f"tap {name}: {taps[name].shape} ({time.time()-t0:.1f}s)")

    for name, feats_all in taps.items():
        for band, qt in ((1024, 512), (2048, 512), (3072, 384), (4096, 384)):
            for keyname in ("pca", "chan", "spatialx"):
                recs, certs, fail_mx, miss = [], [], 0, 0
                for b in range(B):
                    f = feats_all[b]
                    if keyname == "pca":
                        c = f - f.mean(0)
                        cov = c.T @ c
                        w, v = np.linalg.eigh(cov)
                        keys = f @ v[:, -1]
                    elif keyname == "chan":
                        keys = f[:, f.var(0).argmax()]
                    else:
                        keys = x[b, :, 0]
                    r = study(f"{name} b{b}", f, keys, band, qt)
                    if r is None:
                        continue
                    recs.append(r[0])
                    certs.append(r[1])
                    fail_mx = max(fail_mx, r[2])
                    miss += r[3]
                log(f"{name} band={band} qt={qt} key={keyname}: "
                    f"recall {np.mean(recs):.5f} cert {np.mean(certs):.5f} "
                    f"worst-block fails {fail_mx} "
                    f"cert-missed-nbrs {miss} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
