"""Round-5 fourth TPU batch (one process = one TPU claim):

  1. entry check
  2. predict retroactive-repair smoke ON DEVICE — the repair path
     (commit a40101e) landed after the r5c batch and has only run under
     the CPU test suite.  Checks, on the real chip:
       a. healthy predict: empty suspect list, finite predictions;
       b. forced-repair predict (suspect_dispatches patched to name two
          batches once): bit-equal to the healthy run (banding inert at
          this scene size, so mode-2 re-runs reproduce the rows) and the
          repair pass costs no recompile (wall-time ratio bound).
  3. bench — the exact program the driver runs at round end; validates
     the full production config end-to-end and logs one more
     drift-anchored point.

    python scripts/tpu_batch_r5d.py > /tmp/tpu_batch_r5d.log 2>&1
"""

import sys
import time
import traceback

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def banner(tag):
    print(f"\n===== {tag} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def run_stage(tag, fn):
    banner(tag)
    t0 = time.time()
    try:
        fn()
        print(f"[{tag} ok in {time.time()-t0:.0f}s]", flush=True)
    except Exception:
        print(f"{tag} FAILED:", flush=True)
        traceback.print_exc()


def entry_check():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    out.block_until_ready()
    print("entry forward:", out.shape, out.dtype, flush=True)


def predict_repair_smoke():
    import importlib
    import tempfile

    import jax
    import numpy as np

    P = importlib.import_module("dgcnn_tpu.eval.predict")
    from dgcnn_tpu.io.las import write_las
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import (
        BandGuardScheduler,
        init_train_state,
        make_optimizer,
    )
    from dgcnn_tpu.utils.logging import IOStream

    tmp = tempfile.mkdtemp(prefix="r5d_repair_")
    rng = np.random.default_rng(0)
    n = 60_000
    xy = rng.random((n, 2)) * 35
    z = 0.05 * xy[:, 0] + rng.normal(0, 0.1, n)
    las = f"{tmp}/tile.las"
    write_las(las, xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, np.full(n, 2))

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=32,
                      knn_impl="pallas_capped", knn_band=0,
                      knn_band_feature=256, knn_band_recall_guard=16,
                      knn_band_guard_every=4)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(f"{tmp}/m.npz", state)
    io = IOStream(f"{tmp}/log.txt")
    kwargs = dict(
        num_points=1024, num_classes=3, num_features=4, emb_dims=32,
        model_label="m", model_root=tmp,
        knn_impl="pallas_capped", knn_band=0, knn_band_feature=256,
        knn_band_recall_guard=16, knn_band_guard_every=4,
        min_class_confidence=0.0, batch_size=4, block_size=20.0,
    )

    t0 = time.time()
    _, pred_ref = P.predict(6, io, las, f"{tmp}/a.las", **kwargs)
    t_cold = time.time() - t0
    t0 = time.time()
    _, pred_warm = P.predict(6, io, las, f"{tmp}/b.las", **kwargs)
    t_warm = time.time() - t0
    np.testing.assert_array_equal(pred_warm, pred_ref)
    print(f"healthy predict: cold {t_cold:.1f}s warm {t_warm:.2f}s, "
          f"{pred_ref.size} pts, classes {np.unique(pred_ref)}",
          flush=True)

    forced = {"arm": True}
    orig = BandGuardScheduler.suspect_dispatches

    def fake_suspects(self):
        if forced.pop("arm", None):
            return [0, 1]
        return []

    BandGuardScheduler.suspect_dispatches = fake_suspects
    try:
        t0 = time.time()
        _, pred_fix = P.predict(6, io, las, f"{tmp}/c.las", **kwargs)
        t_fix = time.time() - t0
    finally:
        BandGuardScheduler.suspect_dispatches = orig
    assert not forced, "repair pass did not consume the forced list"
    np.testing.assert_array_equal(pred_fix, pred_ref)
    # repair re-dispatches 2 of the batches through the SAME memoised jit
    # program — a recompile would blow this bound wide open
    assert t_fix < t_warm * 3 + 5, (t_fix, t_warm)
    print(f"forced repair: {t_fix:.2f}s (warm {t_warm:.2f}s) — bit-equal, "
          "no recompile", flush=True)


def bench_run():
    sys.argv = ["bench.py"]
    import bench

    bench.main()


def main():
    import jax

    t0 = time.time()
    d = jax.devices()[0]
    print(f"device up: {d.device_kind} after {time.time()-t0:.0f}s",
          flush=True)
    run_stage("entry check", entry_check)
    run_stage("predict retroactive-repair smoke", predict_repair_smoke)
    run_stage("bench", bench_run)
    banner("DONE")


if __name__ == "__main__":
    main()
