"""CLI front-end tests: the ``main.py`` flag surface actually drives the
four reference modes end-to-end (process_data → train → eval → predict)
and the --config/str2bool plumbing behaves. Reference CLI:
/root/reference/main.py:43-136."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main as cli
from dgcnn_tpu.io.las import write_las

K, NUM_POINTS, EMB = 6, 256, 32


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """Tiny scene + params files + a cwd for checkpoints/ artifacts."""
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(7)
    n, extent = 24000, 50.0
    xy = rng.random((n, 2)) * extent
    z = 0.02 * xy[:, 0] + rng.normal(0, 0.05, n)
    cls = np.full(n, 2)
    veg = rng.random(n) < 0.3
    z[veg] += rng.random(veg.sum()) * 8 + 0.8
    cls[veg] = 5
    inb = (xy[:, 0] > 10) & (xy[:, 0] < 22) & (xy[:, 1] > 10) \
        & (xy[:, 1] < 22) & ~veg
    z[inb] = 0.02 * xy[inb, 0] + 5.0
    cls[inb] = 6
    raw = root / "raw"
    raw.mkdir()
    write_las(str(raw / "tile.las"), xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, cls)

    params = root / "params"
    params.mkdir()
    (params / "class_map.json").write_text(json.dumps({"2": 1, "5": 2,
                                                       "6": 0}))
    (params / "categories.json").write_text(json.dumps(
        {"1.0": "ground", "2.0": "vegetation", "0.0": "building"}))
    (params / "features.json").write_text(json.dumps(
        {"X": 0, "Y": 1, "Z": 2, "AGL": 3, "Class": 4}))
    return root


def _chdir(monkeypatch, root):
    cwd = root / "cwd"
    cwd.mkdir(exist_ok=True)
    monkeypatch.chdir(cwd)
    # keep the persistent compilation cache out of the test environment
    monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", "")


def test_str2bool():
    assert cli.str2bool("Yes") and cli.str2bool("1") and cli.str2bool(True)
    assert not cli.str2bool("f") and not cli.str2bool("NO")
    with pytest.raises(Exception):
        cli.str2bool("maybe")


def test_config_file_defaults_cli_wins(tmp_path):
    conf = tmp_path / "c.json"
    conf.write_text(json.dumps({"k": 7, "epochs": 3, "exp_name": "fromcfg"}))
    args = cli.parse_cli(["--config", str(conf), "--epochs", "9"])
    assert args.k == 7                  # config default applied
    assert args.epochs == 9             # explicit flag beats config
    assert args.exp_name == "fromcfg"


@pytest.fixture(scope="module")
def cli_processed(cli_env):
    """process_data through main.main(argv) — the CLI mode itself is
    under test, so the fixture IS an assertion-bearing step."""
    base = cli_env / "base"
    npy = base / "npy"
    params = cli_env / "params"
    # disable the persistent compilation cache for every test in this
    # module (restored at module teardown — '' would otherwise leak and
    # silently disable cache/warm-marker behaviour for later modules)
    prev_cache = os.environ.get("DGCNN_JAX_CACHE_DIR")
    os.environ["DGCNN_JAX_CACHE_DIR"] = ""
    cwd = os.getcwd()
    os.chdir(cli_env)
    try:
        cli.main([
            "--mode", "process_data",
            "--base_dir", str(base), "--root_dir", str(base),
            "--pc_folder", str(cli_env / "raw"),
            "--data_folder", str(base / "data"),
            "--processed_data_folder", str(base / "processed"),
            "--npy_data_folder", str(npy),
            "--area", "TestArea",
            "--categories_file", str(params / "categories.json"),
            "--features_file", str(params / "features.json"),
            "--class_map_file", str(params / "class_map.json"),
            "--block_size", "40", "--sample_num", "2",
            "--min_class_num", "20",
            "--num_points", str(NUM_POINTS), "--sub_block_size", "20",
            "--sub_sample_num", "3", "--n_tries", "6",
            "--desired_seed_cell_size", "20", "--boundary_block_width", "3",
            "--cell_size", "1", "--seed", "0",
        ])
    finally:
        os.chdir(cwd)
    rooms = [f for f in os.listdir(npy) if f.endswith(".npy")]
    assert rooms, "process_data produced no npy rooms"
    yield npy
    if prev_cache is None:
        os.environ.pop("DGCNN_JAX_CACHE_DIR", None)
    else:
        os.environ["DGCNN_JAX_CACHE_DIR"] = prev_cache


def test_cli_full_lifecycle(cli_env, cli_processed, monkeypatch):
    """train (2 epochs) → eval → predict, all through main.main(argv)
    exactly as a shell user would run them."""
    _chdir(monkeypatch, cli_env)
    npy = cli_processed

    model_root = str(cli_env / "ckpt")
    common = [
        "--data_dir", str(npy), "--num_points", str(NUM_POINTS),
        "--num_classes", "3", "--num_features", "4", "--k", str(K),
        "--emb_dims", str(EMB), "--model_root", model_root,
        "--exp_name", "cli_test", "--knn_impl", "xla",
    ]
    cli.main([
        "--mode", "classifier", "--eval", "0", *common,
        "--epochs", "2", "--batch_size", "2",
        "--validation_batch_size", "2", "--validation_prop", "0.34",
        "--dropout", "0.0", "--scheduler", "cos", "--seed", "3",
    ])
    assert os.path.exists(os.path.join(model_root, "dgcnn_model.npz"))

    cli.main([
        "--mode", "classifier", "--eval", "1", *common,
        "--test_batch_size", "2", "--validation_prop", "0.34",
        "--test_visu_dir", str(cli_env / "pred_dump"), "--seed", "3",
    ])
    dumps = os.listdir(cli_env / "pred_dump")
    assert any(f.endswith("_pred_gt.txt") for f in dumps)

    out_las = str(cli_env / "classified.las")
    cli.main([
        "--mode", "classifier", "--predict", str(cli_env / "raw" /
                                                 "tile.las"),
        "--predict_out", out_las, *common,
        "--block_size", "20", "--min_class_confidence", "0.0",
    ])
    assert os.path.exists(out_las)
    from dgcnn_tpu.io.las import read_las

    lo = read_las(out_las)
    assert len(lo) > 0
    assert set(np.unique(lo.classification)) <= {0, 1, 2, 31}


def test_cli_tensor_parallel_train(cli_env, cli_processed, monkeypatch):
    """--tensor_parallel 2 through the CLI on the 8-virtual-device mesh:
    the flag must reach train() and produce a loadable checkpoint."""
    _chdir(monkeypatch, cli_env)
    model_root = str(cli_env / "ckpt_tp")
    cli.main([
        "--mode", "classifier", "--eval", "0",
        "--data_dir", str(cli_processed), "--num_points", str(NUM_POINTS),
        "--num_classes", "3", "--num_features", "4", "--k", str(K),
        "--emb_dims", str(EMB), "--model_root", model_root,
        "--exp_name", "cli_tp", "--knn_impl", "xla",
        "--tensor_parallel", "2",
        "--epochs", "1", "--batch_size", "2",
        "--validation_batch_size", "2", "--validation_prop", "0.34",
        "--dropout", "0.0", "--seed", "3",
    ])
    assert os.path.exists(os.path.join(model_root, "dgcnn_model.npz"))


def test_cli_visualize_mode(cli_env, monkeypatch, tmp_path):
    """--mode visualize drives viz/features.py end-to-end: t-SNE PNGs and
    DBSCAN-cluster LAS from a checkpoint + test-split blocks
    (/root/reference/visualisation.py:16-219)."""
    import jax

    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer

    _chdir(monkeypatch, cli_env)
    rng = np.random.default_rng(3)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(8):  # floor(8 * 0.34) = 2 test-split rooms
        pts = rng.random((300, 4)) * 30
        labels = rng.integers(0, 3, (300, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=K, emb_dims=EMB,
                      knn_impl="xla", knn_query_chunk=None)
    state = init_train_state(jax.random.key(0), cfg, make_optimizer())
    model_root = tmp_path / "ckpt"
    model_root.mkdir()
    save_checkpoint(str(model_root / "dgcnn_model.npz"), state, epoch=0)

    common = [
        "--data_dir", str(data_dir), "--num_points", "64",
        "--num_classes", "3", "--num_features", "4", "--k", str(K),
        "--emb_dims", str(EMB), "--model_root", str(model_root),
        "--exp_name", "cli_viz", "--knn_impl", "xla", "--seed", "3",
        "--validation_prop", "0.34",
    ]
    viz_dir = tmp_path / "viz"
    cli.main([
        "--mode", "visualize", *common,
        "--viz_kind", "tsne", "--viz_depth", "5",
        "--viz_dir", str(viz_dir), "--viz_blocks", "2",
        "--viz_max_points", "64", "--viz_perplexity", "10",
    ])
    pngs = [f for f in os.listdir(viz_dir) if f.endswith(".png")]
    assert len(pngs) == 2, pngs

    cli.main([
        "--mode", "visualize", *common,
        "--viz_kind", "clusters", "--viz_depth", "5",
        "--viz_dir", str(viz_dir), "--viz_blocks", "1",
        "--viz_cluster_eps", "5.0", "--viz_cluster_min_samples", "3",
    ])
    las = [f for f in os.listdir(viz_dir) if f.endswith(".las")]
    assert las, os.listdir(viz_dir)
    from dgcnn_tpu.io.las import read_las

    lo = read_las(os.path.join(viz_dir, las[0]))
    assert len(lo) == 64


def test_cli_point_sharded_training(monkeypatch, tmp_path):
    """--point_shards N at train time (whole-cloud fine-tuning workflow,
    the training analogue of removing the reference's 30 m tiling cap —
    pointcloud_util.py:97-192): the 8-way point-sharded trajectory must
    match the unsharded CLI run on identical data, and the checkpoint
    must restore. Production-shape parity for the same step lives in
    __graft_entry__.dryrun_multichip (N=8x1024, emb=1024, grad drift
    ~1e-7); this pins the CLI workflow end-to-end."""
    import re

    rng = np.random.default_rng(11)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(14):
        pts = rng.random((300, 4)) * 30
        labels = rng.integers(0, 3, (300, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    pat = re.compile(r"Train \d+, loss: ([0-9.]+)")

    def run(tag, extra):
        cwd = tmp_path / tag
        cwd.mkdir()
        monkeypatch.chdir(cwd)
        monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", "")
        cli.main([
            "--mode", "classifier", "--eval", "0",
            "--data_dir", str(data_dir), "--num_points", "64",
            "--num_classes", "3", "--num_features", "4", "--k", "4",
            "--emb_dims", "32", "--model_root", str(tmp_path / tag / "m"),
            "--exp_name", tag, "--knn_impl", "xla",
            "--epochs", "2", "--batch_size", "8",
            "--validation_batch_size", "8", "--validation_prop", "0.3",
            "--dropout", "0.0", "--scheduler", "cos", "--seed", "3",
            *extra,
        ])
        log = (cwd / "checkpoints" / tag / "run.log").read_text()
        return [float(m) for m in pat.findall(log)]

    sharded = run("sp8", ["--point_shards", "8"])
    plain = run("plain", [])
    assert len(sharded) == 2 and len(plain) == 2
    np.testing.assert_allclose(sharded, plain, rtol=2e-3)
    assert os.path.exists(tmp_path / "sp8" / "m" / "dgcnn_model.npz")

    # invalid combos fail loudly through the CLI
    with pytest.raises(ValueError, match="mutually exclusive"):
        run("bad", ["--point_shards", "8", "--tensor_parallel", "2"])


def test_cli_combined_axis_mesh_training(monkeypatch, tmp_path):
    """Combined-axis mesh training (VERDICT r4 item 7): the two
    compositions the mesh supports — {data:2, points:4} and
    {data:4, tensor_parallel:2} — must both reproduce the unsharded CLI
    training trajectory on identical data. The third composition
    (points x tensor_parallel) is restricted BY DESIGN: TP is
    annotation-only GSPMD which cannot live inside the point-sharded
    path's manual shard_map region, and both map to the mesh's 'points'
    axis — the restriction is validated loudly (DESIGN.md behaviour
    choices)."""
    import re

    rng = np.random.default_rng(11)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(14):
        pts = rng.random((300, 4)) * 30
        labels = rng.integers(0, 3, (300, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    pat = re.compile(r"Train \d+, loss: ([0-9.]+)")

    def run(tag, extra):
        cwd = tmp_path / tag
        cwd.mkdir()
        monkeypatch.chdir(cwd)
        monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", "")
        cli.main([
            "--mode", "classifier", "--eval", "0",
            "--data_dir", str(data_dir), "--num_points", "64",
            "--num_classes", "3", "--num_features", "4", "--k", "4",
            "--emb_dims", "32", "--model_root", str(tmp_path / tag / "m"),
            "--exp_name", tag, "--knn_impl", "xla",
            "--epochs", "2", "--batch_size", "8",
            "--validation_batch_size", "8", "--validation_prop", "0.3",
            "--dropout", "0.0", "--scheduler", "cos", "--seed", "3",
            *extra,
        ])
        log = (cwd / "checkpoints" / tag / "run.log").read_text()
        return [float(m) for m in pat.findall(log)]

    plain = run("plain", [])
    assert len(plain) == 2
    # data x points: batch 8 over data axis 2, N=64 over points axis 4
    dp_sp = run("d2p4", ["--point_shards", "4"])
    np.testing.assert_allclose(dp_sp, plain, rtol=2e-3)
    # data x tensor_parallel: batch 8 over data axis 4, trunk over tp=2
    dp_tp = run("d4tp2", ["--tensor_parallel", "2"])
    np.testing.assert_allclose(dp_tp, plain, rtol=2e-3)
    # points x tensor_parallel: restricted by design, fails loudly
    with pytest.raises(ValueError, match="mutually exclusive"):
        run("sp_tp", ["--point_shards", "4", "--tensor_parallel", "2"])


def test_cli_point_sharded_val_tail_batch(monkeypatch, tmp_path):
    """--point_shards 4 on 8 devices leaves a data axis of 2: validation
    tail batches (drop_last=False) not divisible by it must be mask-padded
    for the shard_map specs, not crash (review finding r4)."""
    rng = np.random.default_rng(5)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(12):  # floor(12*0.25)=3 val rooms -> tail batch of 1
        pts = rng.random((300, 4)) * 30
        labels = rng.integers(0, 3, (300, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    cwd = tmp_path / "cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", "")
    cli.main([
        "--mode", "classifier", "--eval", "0",
        "--data_dir", str(data_dir), "--num_points", "64",
        "--num_classes", "3", "--num_features", "4", "--k", "4",
        "--emb_dims", "32", "--model_root", str(tmp_path / "m"),
        "--exp_name", "sp4tail", "--knn_impl", "xla",
        "--epochs", "1", "--batch_size", "8",
        "--validation_batch_size", "2", "--validation_prop", "0.25",
        "--dropout", "0.0", "--seed", "3", "--point_shards", "4",
    ])
    assert os.path.exists(tmp_path / "m" / "dgcnn_model.npz")
    # and an indivisible BATCH SIZE fails loudly at setup, not mid-epoch
    with pytest.raises(ValueError, match="divisible"):
        cli.main([
            "--mode", "classifier", "--eval", "0",
            "--data_dir", str(data_dir), "--num_points", "64",
            "--num_classes", "3", "--num_features", "4", "--k", "4",
            "--emb_dims", "32", "--model_root", str(tmp_path / "m2"),
            "--exp_name", "sp4bad", "--knn_impl", "xla",
            "--epochs", "1", "--batch_size", "7",
            "--validation_batch_size", "2", "--validation_prop", "0.25",
            "--dropout", "0.0", "--seed", "3", "--point_shards", "4",
        ])
