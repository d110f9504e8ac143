"""Serving layer: directory watcher classifies tiles, isolates failures,
stays idempotent, and reports status (dgcnn_tpu/serve)."""

import json
import os

import jax
import numpy as np
import pytest

from dgcnn_tpu.io.las import write_las
from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.serve import (
    PredictService,
    serve_directory,
    start_status_server,
)
from dgcnn_tpu.train.checkpoint import save_checkpoint
from dgcnn_tpu.train.steps import init_train_state, make_optimizer

K, NUM_POINTS, EMB, NUM_CLASSES = 6, 128, 32, 3


def _make_tile(path, seed=0, n=9000, extent=25.0):
    rng = np.random.default_rng(seed)
    xy = rng.random((n, 2)) * extent
    z = 0.02 * xy[:, 0] + rng.normal(0, 0.1, n)
    cls = np.full(n, 2)
    write_las(str(path), xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, cls)


@pytest.fixture(scope="module")
def model_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_ckpt")
    cfg = DGCNNConfig(num_classes=NUM_CLASSES, num_features=4, k=K,
                      emb_dims=EMB)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(str(root / "dgcnn_model.npz"), state)
    return root


@pytest.fixture
def service(model_root):
    return PredictService(
        K, num_points=NUM_POINTS, block_size=25.0,
        num_classes=NUM_CLASSES, num_features=4, emb_dims=EMB,
        min_class_confidence=0.0, model_root=str(model_root),
        batch_size=2,
    )


def test_serve_directory_classifies_and_reports(service, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _make_tile(in_dir / "tile_a.las", seed=1)
    _make_tile(in_dir / "tile_b.las", seed=2)

    n = serve_directory(service, str(in_dir), str(out_dir), once=True,
                        settle_s=0.0)
    assert n == 2
    for stem in ("tile_a", "tile_b"):
        assert (out_dir / f"{stem}.las").exists()
        stats = json.loads((out_dir / f"{stem}.las.json").read_text())
        assert stats["points"] > 0 and stats["seconds"] > 0
    status = json.loads((out_dir / "status.json").read_text())
    assert status["processed"] == 2 and status["failed"] == 0
    assert status["total_points"] > 0

    # idempotent: a second sweep does nothing
    n2 = serve_directory(service, str(in_dir), str(out_dir), once=True,
                         settle_s=0.0)
    assert n2 == 0


def test_serve_directory_isolates_failures(service, tmp_path):
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "corrupt.las").write_bytes(b"not a las file at all")
    _make_tile(in_dir / "good.las", seed=3)

    # the return value counts only SUCCESSFUL tiles (max_tiles separately
    # bounds attempts — see test_bounded_run_with_failures_terminates)
    n = serve_directory(service, str(in_dir), str(out_dir), once=True,
                        settle_s=0.0)
    assert n == 1
    assert (out_dir / "good.las").exists()
    err = json.loads(
        (out_dir / "failed" / "corrupt.las.error.json").read_text())
    assert "error" in err
    status = json.loads((out_dir / "status.json").read_text())
    assert status["failed"] == 1 and status["processed"] == 1
    # failed tile is not retried on the next sweep
    assert serve_directory(service, str(in_dir), str(out_dir), once=True,
                           settle_s=0.0) == 0


def test_status_server(service, tmp_path):
    import urllib.request

    thread = start_status_server(service, 0)
    port = thread.server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        body = json.loads(r.read())
    assert body["processed"] == service.processed
    thread.server.shutdown()


def test_cli_once(model_root, tmp_path):
    from dgcnn_tpu.serve.__main__ import main

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _make_tile(in_dir / "t.las", seed=4)
    rc = main([
        "--in_dir", str(in_dir), "--out_dir", str(out_dir), "--once",
        "--model_root", str(model_root), "--k", str(K),
        "--num_points", str(NUM_POINTS), "--block_size", "25",
        "--num_classes", str(NUM_CLASSES), "--emb_dims", str(EMB),
        "--min_class_confidence", "0", "--test_batch_size", "2",
        "--settle_s", "0",
    ])
    assert rc == 0
    assert (out_dir / "t.las").exists()


def test_serve_empty_tile_is_not_a_failure(service, tmp_path):
    """A tile with too few points for any block classifies to zero points
    (predict writes no LAS) — the service must record it as processed
    with points=0, not as a failure."""
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    _make_tile(in_dir / "sparse.las", seed=5, n=10)

    n = serve_directory(service, str(in_dir), str(out_dir), once=True,
                        settle_s=0.0)
    assert n == 1
    stats = json.loads((out_dir / "sparse.las.json").read_text())
    assert stats["points"] == 0 and stats["output"] is None
    status = json.loads((out_dir / "status.json").read_text())
    assert status["failed"] == 0 and status["processed"] == 1


def test_bounded_run_with_failures_terminates(service, tmp_path):
    """max_tiles bounds ATTEMPTS: a backlog containing failures must not
    make a bounded watcher (once=False) poll forever waiting for enough
    successes."""
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "bad1.las").write_bytes(b"junk")
    (in_dir / "bad2.las").write_bytes(b"more junk")
    _make_tile(in_dir / "ok.las", seed=5)

    # 3 tiles, max_tiles=3 -> terminates after attempting all three even
    # though only one succeeds (pre-fix this hung: done stayed at 1 < 3)
    n = serve_directory(service, str(in_dir), str(out_dir),
                        settle_s=0.0, max_tiles=3, poll_s=0.1)
    assert n == 1
    assert (out_dir / "ok.las").exists()
    assert (out_dir / "failed" / "bad1.las.error.json").exists()
    assert (out_dir / "failed" / "bad2.las.error.json").exists()


def test_pipeline_overlaps_slow_loads(service, tmp_path, monkeypatch):
    """Latency-injection proof of the one-slot tile pipeline: with every
    load stage costing an injected 0.3 s (slow storage) and every
    classify stage 0.3 s, a 4-tile serial chain is exactly 4x0.6 = 2.4 s
    of injected sleeps — the prefetch thread must overlap loads under
    classifies and beat that bound by >= 1.3x. All timed work is
    injected sleep, so the bound is deterministic up to scheduler noise.
    Also asserts tiles 2..n actually CONSUMED the prefetched data (no
    silent reload on the main thread)."""
    import importlib
    import time

    # attribute access resolves to the predict FUNCTION re-exported by
    # the package; import_module gets the submodule itself
    ep = importlib.import_module("dgcnn_tpu.eval.predict")

    load_s = compute_s = 0.3
    n_tiles = 4
    loads, consumed = [], []

    def slow_load(path, features=None, features_output=None):
        time.sleep(load_s)
        loads.append(os.path.basename(path))
        data = np.zeros((NUM_POINTS, 4), np.float32)
        return data, np.zeros(NUM_POINTS, np.int64)

    def fake_predict(k, io, in_path, out_path, preloaded=None, **kw):
        consumed.append((os.path.basename(in_path), preloaded is not None))
        data, labels = preloaded if preloaded is not None else slow_load(
            in_path)
        time.sleep(compute_s)  # device + DTM/AGL stand-in
        with open(out_path, "w") as f:
            f.write("classified")
        return data, np.zeros(len(data), np.int64)

    monkeypatch.setattr(ep, "predict_load", slow_load)
    monkeypatch.setattr(ep, "predict", fake_predict)

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    for i in range(n_tiles):
        (in_dir / f"t{i}.las").write_bytes(b"not read - loader is patched")
        os.utime(in_dir / f"t{i}.las", (0, 0))  # settled long ago

    t0 = time.perf_counter()
    done = serve_directory(service, str(in_dir), str(out_dir), once=True)
    elapsed = time.perf_counter() - t0

    assert done == n_tiles
    serial = n_tiles * (load_s + compute_s)
    assert elapsed <= serial / 1.3, (
        f"pipeline gave no overlap: {elapsed:.2f}s vs serial {serial:.2f}s")
    # every tile loaded exactly once; tiles 2..n consumed the prefetch
    assert len(loads) == n_tiles
    assert [c[1] for c in sorted(consumed)] == [False] + [True] * (
        n_tiles - 1)
