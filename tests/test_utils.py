"""Utility tests: IOStream, ScalarWriter, prefetch, timing harness, viz."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.data.prefetch import prefetch_to_device
from dgcnn_tpu.utils.logging import IOStream, ScalarWriter
from dgcnn_tpu.utils.profiling import StepTimer, measure


def test_iostream(tmp_path, capsys):
    path = str(tmp_path / "run.log")
    with IOStream(path) as io:
        io.cprint("hello")
        io.cprint("world")
    assert capsys.readouterr().out == "hello\nworld\n"
    assert open(path).read() == "hello\nworld\n"


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("Train/loss", 0.5, 1)
    w.add_scalar("Train/loss", 0.4, 2)
    w.close()
    import json

    rows = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert [r["value"] for r in rows] == [0.5, 0.4]


def test_prefetch_order_and_transfer():
    out = list(prefetch_to_device(range(10), transfer=lambda x: x * 2))
    assert out == [i * 2 for i in range(10)]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch_to_device(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_measure_timing():
    f = jax.jit(lambda x: jnp.sum(x * 2))
    stats = measure(f, jnp.ones((64, 64)), iters=3)
    assert stats["sec_per_call"] >= 0.0
    assert stats["compile_s"] > 0.0


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 5 and s["mean_s"] >= 0


def test_viz_tsne_and_clusters(tmp_path, rng):
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, init_dgcnn
    from dgcnn_tpu.viz.features import (
        feature_tsne,
        generate_feature_map_clusters,
    )

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=16,
                      knn_query_chunk=None)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    block = rng.random((80, 4)).astype(np.float32) * 10
    paths = feature_tsne(params, state, cfg, [block], depth=4,
                         out_dir=str(tmp_path), perplexity=10, max_points=60)
    assert len(paths) == 1 and os.path.exists(paths[0])
    clusters = generate_feature_map_clusters(
        params, state, cfg, block, str(tmp_path / "c.las"), depth=4,
        eps=5.0, min_samples=3,
    )
    assert clusters.shape == (80,)
    from dgcnn_tpu.io.las import read_las

    back = read_las(str(tmp_path / "c.las"))
    assert back.point_source_id is not None


def test_iostream_stderr_keeps_stdout_clean(tmp_path, capsys):
    """bench.py's one-JSON-line stdout contract: a stderr-backed IOStream
    must never write to stdout (still tees to the log file)."""
    import sys

    path = str(tmp_path / "err.log")
    with IOStream(path, stream=sys.stderr) as io:
        io.cprint("diagnostic line")
    out, err = capsys.readouterr()
    assert out == ""
    assert "diagnostic line" in err
    assert "diagnostic line" in open(path).read()


def test_compilation_cache_enable_and_disable(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache points jax at the requested
    dir (creating it), honours DGCNN_JAX_CACHE_DIR overrides, and an
    empty env value disables it entirely."""
    import jax

    from dgcnn_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    target = tmp_path / "jc"
    monkeypatch.delenv("DGCNN_JAX_CACHE_DIR", raising=False)
    got = enable_persistent_compilation_cache(str(target))
    assert got == str(target) and target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)

    override = tmp_path / "other"
    monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", str(override))
    assert enable_persistent_compilation_cache(str(target)) == str(override)

    monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", "")
    assert enable_persistent_compilation_cache(str(target)) is None


def test_env_report_collects():
    """collect_env-style report: versions, native entry points, cache
    state, kernel-selecting config defaults — and valid JSON via main."""
    import json

    from dgcnn_tpu.utils.report import collect_report, main

    rep = collect_report(probe_device=True)
    assert rep["jax"] and rep["python"]
    assert "native_dtmgen" in rep and "config_defaults" in rep
    assert rep["config_defaults"]["knn_band"] >= 0
    assert json.loads(json.dumps(rep, default=str))
    assert main(["--no-device"]) == 0


def test_warm_key_tracks_program_source(tmp_path, monkeypatch):
    """Warm markers key on PROGRAM identity, not just config: touching a
    single byte of a kernel source flips the derived warm key, so a
    kernel edit self-invalidates instead of hiding a full Mosaic
    recompile behind a stale 'warm' claim (VERDICT r4 item 2)."""
    from dgcnn_tpu.utils import compilation_cache as cc

    kern = tmp_path / "pkg" / "kernels"
    kern.mkdir(parents=True)
    src = kern / "fake_kernel.py"
    src.write_text("A = 1\n")
    monkeypatch.setattr(cc, "_PKG_ROOT", str(tmp_path / "pkg"))
    monkeypatch.setattr(cc, "_fingerprint_cache", None)
    monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", str(tmp_path / "jax"))

    key0 = cc.warm_key("train-unroll", 2, 32)
    assert key0 == cc.warm_key("train-unroll", 2, 32)  # stable
    cc.mark_warm(key0)
    assert cc.is_warm(key0)

    # touch one source byte (keep mtime moving even on coarse clocks)
    src.write_text("A = 2\n")
    os.utime(src, ns=(1, 1))
    key1 = cc.warm_key("train-unroll", 2, 32)
    assert key1 != key0
    assert not cc.is_warm(key1)  # the edited program reads cold

    # reverting the edit restores the original identity
    src.write_text("A = 1\n")
    os.utime(src, ns=(2, 2))
    assert cc.warm_key("train-unroll", 2, 32) == key0


def test_bench_anchor_record_rolls_forward(tmp_path, monkeypatch):
    """bench.py's drift anchor: the rolling approx record only moves up,
    and a session reading below it yields session_drift < 1."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..",
                                  "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "BASELINE_CACHE",
                        str(tmp_path / "bench_baseline.json"))
    assert bench.update_anchor_record(100.0) == 100.0
    assert bench.update_anchor_record(80.0) == 100.0   # never rolls back
    assert bench.update_anchor_record(120.0) == 120.0  # rolls forward
    # persists alongside the torch baseline without clobbering it
    bench._save_cache({**bench._load_cache(),
                       "torch_cpu_points_per_sec": 1.0})
    assert bench.update_anchor_record(0.0) == 120.0
    assert bench._load_cache()["torch_cpu_points_per_sec"] == 1.0
