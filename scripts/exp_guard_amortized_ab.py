"""Full-forward A/B of the AMORTIZED feature-band recall guard (round 5).

The round-5 per-call kernel timings (exp_guard_and_prec_cost.py, r5a/r5b)
were methodology-suspect (reps-in-jit CSE + sequential drift); standing
conclusion was "the guard costs 0.3-0.8 ms/feature-banded call". This
script measures the thing users feel — per-dispatch forward latency at
the production bench workload (B=8, N=7000, x-sorted) — for:

  - ``none``     : band_mode=None graph — the round-4 guard-every-call
                   production forward (what bench.py's capped arm runs)
  - ``mode1``    : band_mode=1 — amortized graph, probes RUN (a guarded
                   dispatch; should match ``none`` to noise)
  - ``mode0``    : band_mode=0 — amortized graph, probes SKIPPED (what
                   7 of 8 production dispatches run at guard_every=8)
  - ``noguard``  : recall_guard=0 config — the floor mode0 must approach
  - ``wrap8``    : a REAL 32-dispatch loop at the guard_every=8 cadence
                   (mode1 every 8th, mode0 otherwise) — the shipped
                   amortized steady state
  - ``mode2``    : band_mode=2 — the sticky host fallback (full capped
                   kernel); context for what a trip costs

Methodology per CLAUDE.md round-3 lessons: whole-forward dispatches,
async in-loop with ONE scalar sync per timed block, measured round-trip
subtracted, 3 warm dispatches discarded, arms INTERLEAVED across rounds
so chip drift brackets every arm, median across rounds reported. All
band_mode arms share ONE compiled program (the mode is a traced scalar),
so there is no cross-arm compile or CSE hazard.

Reference whose graph-quality contract the guard defends:
/root/reference/model.py:25-40 (exact kNN graph each stage).
"""

import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dgcnn_tpu.models.dgcnn import (  # noqa: E402
    DGCNNConfig,
    apply_dgcnn,
    init_dgcnn,
)

B, N, K, F, C, EMB = 8, 7000, 30, 4, 5, 1024
ROUNDS = 8
ITERS = 32


def make_blocks(seed: int = 0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.0, 30.0, (B, N, F)).astype(np.float32)
    order = np.argsort(pts[..., 0], axis=1, kind="stable")
    return jnp.asarray(np.take_along_axis(pts, order[..., None], axis=1))


def roundtrip_s() -> float:
    one = jnp.zeros(())

    @jax.jit
    def trivial(a):
        return a + 1

    float(trivial(one))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(trivial(one))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    cfg = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                      knn_impl="pallas_capped")
    cfg_ng = DGCNNConfig(num_classes=C, num_features=F, k=K, emb_dims=EMB,
                         knn_impl="pallas_capped",
                         knn_band_recall_guard=0)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = make_blocks()
    rt = roundtrip_s()
    print(f"device {jax.devices()[0].device_kind}, rt {rt*1e3:.1f} ms",
          flush=True)

    @jax.jit
    def fwd_flag(params, state, x, mode):
        (logits, tripped), _ = apply_dgcnn(
            params, state, x, cfg, train=False, band_mode=mode,
            with_band_flag=True)
        return jnp.sum(logits), tripped

    @jax.jit
    def fwd_none(params, state, x):
        return jnp.sum(apply_dgcnn(params, state, x, cfg, train=False)[0])

    @jax.jit
    def fwd_ng(params, state, x):
        return jnp.sum(
            apply_dgcnn(params, state, x, cfg_ng, train=False)[0])

    m0 = jnp.asarray(0, jnp.int32)
    m1 = jnp.asarray(1, jnp.int32)
    m2 = jnp.asarray(2, jnp.int32)

    # compile + warm everything FIRST (one program for all modes)
    s1, trip1 = fwd_flag(params, state, x, m1)
    print(f"guarded dispatch tripped: {bool(trip1)} (must be False for "
          "a clean steady-state A/B)", flush=True)
    for f in (lambda: fwd_flag(params, state, x, m0)[0],
              lambda: fwd_flag(params, state, x, m1)[0],
              lambda: fwd_flag(params, state, x, m2)[0],
              lambda: fwd_none(params, state, x),
              lambda: fwd_ng(params, state, x)):
        for _ in range(3):
            out = f()
        float(out)

    def timed(f):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f()
        float(out)
        return max((time.perf_counter() - t0 - rt) / ITERS, 1e-9)

    def wrap8():
        t0 = time.perf_counter()
        for i in range(ITERS):
            out, _ = fwd_flag(params, state, x, m1 if i % 8 == 0 else m0)
        float(out)
        return max((time.perf_counter() - t0 - rt) / ITERS, 1e-9)

    arms = {
        "none": lambda: timed(lambda: fwd_none(params, state, x)),
        "mode1": lambda: timed(lambda: fwd_flag(params, state, x, m1)[0]),
        "mode0": lambda: timed(lambda: fwd_flag(params, state, x, m0)[0]),
        "noguard": lambda: timed(lambda: fwd_ng(params, state, x)),
        "wrap8": wrap8,
        "mode2": lambda: timed(lambda: fwd_flag(params, state, x, m2)[0]),
    }
    res = {k: [] for k in arms}
    order = list(arms)
    for r in range(ROUNDS):
        # rotate arm order so drift brackets every arm
        for k in order[r % len(order):] + order[:r % len(order)]:
            res[k].append(arms[k]())
        print(f"round {r}: " + "  ".join(
            f"{k}={res[k][-1]*1e3:.2f}" for k in order), flush=True)

    print("\n=== per-dispatch forward ms (median [min..max] over "
          f"{ROUNDS} interleaved rounds of {ITERS} async dispatches) ===",
          flush=True)
    med = {}
    for k in order:
        v = sorted(res[k])
        med[k] = v[len(v) // 2]
        print(f"{k:8s} {med[k]*1e3:7.2f} [{v[0]*1e3:.2f}..{v[-1]*1e3:.2f}]",
              flush=True)
    guard_cost = med["mode1"] - med["mode0"]
    amort = (med["mode1"] + 7 * med["mode0"]) / 8
    floor_delta = (med["mode0"] - med["noguard"]) * 1e3
    print(f"\nguard cost per forward (mode1-mode0): {guard_cost*1e3:.2f} ms"
          f"\nmode0 vs noguard floor: {floor_delta:.2f} ms "
          "(amortized-graph overhead when probes skipped)"
          f"\nderived guard_every=8 per-dispatch: {amort*1e3:.2f} ms"
          f" | measured wrap8: {med['wrap8']*1e3:.2f} ms"
          f"\namortized saving vs guard-every-call: "
          f"{(med['none']-med['wrap8'])*1e3:.2f} ms/dispatch "
          f"({(med['none']-med['wrap8'])/med['none']*100:.1f}%)",
          flush=True)


if __name__ == "__main__":
    main()
