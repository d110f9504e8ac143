"""Decompose the EXACT parity mode's forward (knn_impl="pallas") so the
1.35M-pts/s "floor" claim is a derivation, not a flat sweep (VERDICT r4
item 6 / round-5 item 6).

Method (same replay pattern as exp_knn_floor2.py): capture the three
exact kNN calls' real outputs through a jit, then re-time the forward
with each call replaced by a precomputed constant — the delta IS that
call's in-model cost (gather locality unchanged). Cross-check against
standalone reps-in-jit of the exact kernels at the same shapes.

    python scripts/exp_exact_floor.py > /tmp/exp_exact_floor.log 2>&1
"""

import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import dgcnn_tpu.models.dgcnn as dg
from dgcnn_tpu.kernels.knn_pallas import knn_pallas_exact
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

C, F, K, EMB, N, B = 5, 4, 30, 1024, 7000, 8
ORIG_KNN = dg._knn
REPS = 8


def log(*a):
    print(*a, flush=True)


def main():
    log("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    from bench import make_blocks

    pts = jnp.asarray(make_blocks())
    float(jnp.sum(jnp.ones(())))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(jnp.ones(())))
    rt = (time.perf_counter() - t0) / 20
    log(f"rt: {rt*1e3:.1f} ms")

    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas")
    params, bn = init_dgcnn(jax.random.key(0), cfg)

    # ---- capture the real exact kNN outputs
    traced = []

    def capture(x, cfg_, **kw):
        out = ORIG_KNN(x, cfg_, **kw)
        traced.append(out)
        return out

    dg._knn = capture

    @jax.jit
    def run_capture(p, s, xx):
        traced.clear()
        logits = apply_dgcnn(p, s, xx, cfg, train=False)[0]
        return logits, tuple(traced)

    _, captured = run_capture(params, bn, pts)
    dg._knn = ORIG_KNN
    stash = [np.asarray(c) for c in captured]
    assert len(stash) == 3, len(stash)
    log(f"captured {len(stash)} exact kNN outputs "
        f"{[s.shape for s in stash]}")

    def fwd_time(replay_mask, tag, salt):
        """replay_mask[i]=True -> stage i+1's kNN is a constant replay."""
        cfg_v = DGCNNConfig(num_classes=C, num_features=F, k=K,
                            emb_dims=EMB, knn_impl="pallas",
                            knn_query_chunk=1024 + salt)
        calls = [0]

        def patched(x, cfg_, **kw):
            i = calls[0]
            calls[0] += 1
            if replay_mask[i % 3]:
                return jnp.asarray(stash[i % 3])
            return ORIG_KNN(x, cfg_, **kw)

        dg._knn = patched

        @jax.jit
        def fwd(p, s, xx):
            calls[0] = 0
            return jnp.sum(apply_dgcnn(p, s, xx, cfg_v, train=False)[0])

        try:
            float(fwd(params, bn, pts))
            for _ in range(6):
                float(fwd(params, bn, pts))
            trials = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(6):
                    float(fwd(params, bn, pts))
                trials.append((time.perf_counter() - t0) / 6 - rt)
        finally:
            dg._knn = ORIG_KNN
            fwd.clear_cache()
        med = statistics.median(trials) * 1e3
        log(f"{tag}: {med:.2f} ms [{min(trials)*1e3:.2f}.."
            f"{max(trials)*1e3:.2f}] = {B*N/(med/1e3)/1e6:.2f}M pts/s")
        return med

    full = fwd_time((False, False, False), "exact forward (anchor)", 0)
    none = fwd_time((True, True, True), "all 3 exact kNN replayed", 1)
    ns1 = fwd_time((True, False, False), "s1 replayed (fb live)", 2)
    nfb = fwd_time((False, True, True), "fb (s2+s3) replayed (s1 live)", 3)
    full2 = fwd_time((False, False, False), "exact forward (drift)", 4)

    log(f"\nin-model exact kNN total: {full - none:.2f} ms "
        f"(anchor {full:.2f} / shared {none:.2f})")
    log(f"  s1 exact in-model:        {nfb - none:.2f} ms")
    log(f"  fb s2+s3 exact in-model:  {ns1 - none:.2f} ms")
    log(f"  anchor drift bracket:     [{min(full, full2):.2f}.."
        f"{max(full, full2):.2f}]")

    # ---- standalone cross-checks (reps-in-jit, dependency-chained)
    def timed_many(fn, x):
        @jax.jit
        def many(x0):
            def body(i, carry):
                x_, acc = carry
                idx = fn(x_)
                s = jnp.sum(idx[:, ::131, 0].astype(jnp.float32)) * 1e-30
                return (x_ + s, acc + s)

            return jax.lax.fori_loop(
                0, REPS, body, (x0, jnp.float32(0)))[1]

        float(many(x))
        float(many(x))
        trials = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(many(x))
            trials.append((time.perf_counter() - t0 - rt) / REPS)
        return statistics.median(trials) * 1e3

    log("\n--- standalone exact kernels (reps-in-jit) ---")
    ms = timed_many(lambda x: knn_pallas_exact(x[..., :3], K), pts)
    log(f"s1 exact banded (C=3, band default): {ms:.2f} ms/call")
    rngf = np.random.default_rng(1)
    feat = jnp.asarray(rngf.normal(size=(B, N, 64)).astype(np.float32))
    ms = timed_many(lambda x: knn_pallas_exact(x, K, band=0), feat)
    log(f"feature exact full-width (C=64, band=0): {ms:.2f} ms/call")
    log("DONE")


if __name__ == "__main__":
    main()
