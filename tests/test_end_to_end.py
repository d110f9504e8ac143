"""End-to-end integration: synthetic LAS tile → process_data → .npy rooms →
train → evaluate → whole-cloud predict → postprocess. The full reference
lifecycle (SURVEY.md §0) on a small synthetic scene, CPU-only.
"""

import glob
import os

import numpy as np
import pytest

from dgcnn_tpu.io.las import read_las, write_las
from dgcnn_tpu.utils.logging import IOStream

K, NUM_POINTS, EMB = 6, 256, 32
NUM_CLASSES = 3  # building=0, ground=1, vegetation=2 (params/class_map.json)


def make_scene(rng, extent=80.0, n=60000):
    """Terrain + buildings + vegetation with raw LAS classes 2/6/5."""
    xy = rng.random((n, 2)) * extent
    ground_z = 0.03 * xy[:, 0]
    z = ground_z + rng.normal(0, 0.05, n)
    cls = np.full(n, 2)  # ground
    veg = rng.random(n) < 0.3
    z[veg] += rng.random(veg.sum()) * 12 + 0.8
    cls[veg] = 5
    for bx, by in ((15, 15), (50, 30), (30, 60)):
        inb = ((xy[:, 0] > bx) & (xy[:, 0] < bx + 12) &
               (xy[:, 1] > by) & (xy[:, 1] < by + 12) & ~veg)
        z[inb] = ground_z[inb] + 6.0
        cls[inb] = 6
    return xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, cls


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.fixture(scope="module")
def scene_las(workdir):
    rng = np.random.default_rng(42)
    x, y, z, cls = make_scene(rng)
    pc_dir = workdir / "raw"
    pc_dir.mkdir()
    write_las(str(pc_dir / "tile.las"), x, y, z, cls)
    return pc_dir


@pytest.fixture(scope="module")
def processed(workdir, scene_las):
    """process_data over the synthetic tile."""
    import json

    from dgcnn_tpu.prepare.pipeline import process_data

    base = workdir / "base"
    params = workdir / "params"
    params.mkdir()
    (params / "class_map.json").write_text(
        json.dumps({"2": 1, "5": 2, "6": 0})
    )
    (params / "categories.json").write_text(
        json.dumps({"1.0": "ground", "2.0": "vegetation", "0.0": "building"})
    )
    (params / "features.json").write_text(
        json.dumps({"X": 0, "Y": 1, "Z": 2, "AGL": 3, "Class": 4})
    )
    npy_dir = base / "npy"
    process_data(
        base_dir=str(base),
        root_folder=str(base),
        pc_folder=str(scene_las),
        data_folder=str(base / "data"),
        processed_data_folder=str(base / "processed"),
        npy_data_folder=str(npy_dir),
        area="TestArea",
        categories_file=str(params / "categories.json"),
        features_file=str(params / "features.json"),
        features_output=["x", "y", "z", "agl"],
        block_size=40,
        sample_num=2,
        min_class_num=40,
        class_map_file=str(params / "class_map.json"),
        calc_agl=True,
        cell_size=1,
        desired_seed_cell_size=20,
        boundary_block_width=3,
        detect_water=False,
        remove_buildings=True,
        output_tin_file_path=None,
        dtm_buffer=6,
        dtm_module_path="",
        num_points=NUM_POINTS,
        sub_block_size=20,
        use_all_points=False,
        sub_sample_num=4,
        n_tries=6,
        seed=0,
    )
    return base, npy_dir


def test_process_data_artifacts(processed):
    base, npy_dir = processed
    rooms = sorted(glob.glob(str(npy_dir / "*.npy")))
    assert len(rooms) >= 4, rooms
    room = np.load(rooms[0])
    assert room.shape == (NUM_POINTS, 5)  # x y z agl label
    labels = room[:, -1]
    assert set(np.unique(labels)) <= {0.0, 1.0, 2.0}
    # min-corner shift applied
    assert room[:, 0].min() == pytest.approx(0.0, abs=1e-6)
    # AGL sane: mostly >= -1 and buildings/vegetation well above 0
    agl = room[:, 3]
    assert np.median(agl[labels == 1]) == pytest.approx(0.0, abs=0.5)
    assert agl[labels == 0].mean() > 2.0
    # meta indexes written
    assert os.path.exists(base / "meta" / "anno_paths.txt")
    assert os.path.exists(base / "meta" / "all_data_label.txt")
    # LAS sub-tiles written
    assert glob.glob(str(base / "converted-pcs" / "Area_*.las"))


@pytest.fixture(scope="module")
def trained(processed, workdir):
    from dgcnn_tpu.train.loop import train

    base, npy_dir = processed
    model_root = workdir / "ckpt"
    io = IOStream(str(workdir / "train.log"))
    summary = train(
        K, io,
        data_dir=str(npy_dir),
        num_points=NUM_POINTS,
        epochs=3,
        num_classes=NUM_CLASSES,
        num_features=4,
        train_batch_size=2,
        validation_batch_size=2,
        lr=3e-3,
        emb_dims=EMB,
        scheduler="cos",
        validation_prop=0.25,
        model_root=str(model_root),
        exp_name="e2e",
        tb_dir=str(workdir / "tb"),
        seed=1,
        data_parallel=False,
    )
    return model_root, summary


def test_training_produces_checkpoint_and_learns(trained):
    model_root, summary = trained
    assert os.path.exists(model_root / "dgcnn_model.npz")
    assert summary["best_balanced_accuracy"] > 0.45, summary


def test_training_resumes(trained, processed, workdir):
    from dgcnn_tpu.train.loop import train

    base, npy_dir = processed
    model_root, _ = trained
    io = IOStream(str(workdir / "resume.log"))
    # same epochs -> resume loads epoch e, start_epoch > done -> no-op run
    summary = train(
        K, io, data_dir=str(npy_dir), num_points=NUM_POINTS, epochs=3,
        num_classes=NUM_CLASSES, num_features=4, train_batch_size=2,
        validation_batch_size=2, emb_dims=EMB,
        model_root=str(model_root), exp_name="e2e_resume",
        tb_dir=str(workdir / "tb2"), seed=1, data_parallel=False,
    )
    with open(workdir / "resume.log") as f:
        assert "Use pretrained model" in f.read()


def test_evaluation(trained, processed, workdir):
    from dgcnn_tpu.eval.test import test as run_test

    _, npy_dir = processed
    model_root, _ = trained
    io = IOStream(str(workdir / "test.log"))
    pred_dir = workdir / "predict_dumps"
    metrics = run_test(
        K, io,
        data_dir=str(npy_dir),
        num_points=NUM_POINTS,
        num_classes=NUM_CLASSES,
        num_features=4,
        test_batch_size=2,
        emb_dims=EMB,
        min_class_confidence=0.0,
        model_root=str(model_root),
        pred_dir=str(pred_dir),
        test_area="1",
        validation_prop=0.25,
        seed=1,
    )
    assert metrics["accuracy"] > 0.4
    dumps = glob.glob(str(pred_dir / "Area_1_room_*_pred_gt.txt"))
    assert dumps
    rows = np.loadtxt(dumps[0])
    assert rows.shape[1] == 4  # x y z pred
    truths = glob.glob(str(pred_dir / "Area_1_room_*_true_labels.txt"))
    assert truths


def test_whole_cloud_predict(trained, scene_las, workdir):
    from dgcnn_tpu.eval.predict import predict

    model_root, _ = trained
    io = IOStream(str(workdir / "predict.log"))
    out_las = workdir / "classified.las"
    data, preds = predict(
        K, io,
        str(scene_las / "tile.las"),
        str(out_las),
        num_points=NUM_POINTS,
        block_size=20.0,
        num_classes=NUM_CLASSES,
        num_features=4,
        emb_dims=EMB,
        min_class_confidence=0.0,
        model_root=str(model_root),
        batch_size=4,
    )
    assert len(data) == len(preds) > 0
    assert set(np.unique(preds)) <= set(range(NUM_CLASSES)) | {31}
    back = read_las(str(out_las))
    assert len(back) == len(data)
    # the model should label a decent share of points as ground in a scene
    # that is ~half ground
    assert (back.classification == 1).mean() > 0.2


def test_eval_dumps_feed_postprocess(trained, processed, workdir):
    """dump_logits=True rows must satisfy the postprocess row contract
    (xyz 0:3, rni 3:6, pred 6, gt 7, logits 8:) all the way through
    prob_map -> combine -> metrics."""
    from dgcnn_tpu.eval.test import test as run_test
    from dgcnn_tpu.postprocess.combine import combine_dirs
    from dgcnn_tpu.postprocess.metrics import evaluate_combined_dir
    from dgcnn_tpu.postprocess.prob_map import process_dir

    _, npy_dir = processed
    model_root, _ = trained
    io = IOStream(str(workdir / "dumplog.log"))
    pred_dir = workdir / "dumps_logits"
    run_test(
        K, io, data_dir=str(npy_dir), num_points=NUM_POINTS,
        num_classes=NUM_CLASSES, num_features=4, test_batch_size=2,
        emb_dims=EMB, min_class_confidence=0.0, model_root=str(model_root),
        pred_dir=str(pred_dir), test_area="1", validation_prop=0.25,
        seed=1, dump_logits=True,
    )
    dumps = glob.glob(str(pred_dir / "Area_1_room_*_pred_gt.txt"))
    assert dumps
    rows = np.loadtxt(dumps[0])
    assert rows.shape[1] == 8 + NUM_CLASSES
    # columns 8: are RAW logits (downstream softmaxes exactly once), not
    # probabilities — a trained model's logit rows don't sum to 1
    assert np.abs(rows[:, 8:].sum(1) - 1.0).max() > 1e-3
    # column 6 = pred consistent with the dumped logits (threshold 0 here)
    np.testing.assert_array_equal(rows[:, 6], rows[:, 8:].argmax(1))
    # columns 3:6 = real non-xyz input features zero-padded: with F=4 the
    # AGL feature lands in col 3 (varies over the scene), cols 4:6 are pad
    assert rows[:, 3].std() > 0
    np.testing.assert_array_equal(rows[:, 4:6], 0)

    probs = process_dir(str(pred_dir), str(workdir / "probd"), "1")
    assert probs
    prob_rows = np.loadtxt(probs[0])
    np.testing.assert_allclose(prob_rows[:, 8:].sum(1), 1.0, atol=1e-6)

    combined = combine_dirs(str(pred_dir), str(pred_dir),
                            str(workdir / "combd"), "1")
    assert combined
    m = evaluate_combined_dir(str(workdir / "combd"), NUM_CLASSES, "1")
    # self-combined metrics equal the eval metrics on co-located points
    assert m["accuracy"] > 0.4 and m["rooms"] >= 1


def test_multi_area_aggregate_eval(trained, processed, workdir):
    """test_area='all': aggregate acc/bacc/IoU across area dirs
    (/root/reference/test.py:182-193). Two copies of the same area must
    double the confusion matrix and keep every derived metric identical."""
    from dgcnn_tpu.eval.test import test as run_test, test_all

    _, npy_dir = processed
    model_root, _ = trained
    io = IOStream(str(workdir / "all.log"))
    kwargs = dict(
        num_points=NUM_POINTS, num_classes=NUM_CLASSES, num_features=4,
        test_batch_size=2, emb_dims=EMB, min_class_confidence=0.0,
        model_root=str(model_root), pred_dir=str(workdir / "all_dumps"),
        validation_prop=0.25, seed=1,
    )
    single = run_test(K, io, data_dir=str(npy_dir), test_area="1", **kwargs)
    agg = test_all(K, io, {"A": str(npy_dir), "B": str(npy_dir)}, **kwargs)
    np.testing.assert_allclose(agg["confusion"], 2 * single["confusion"])
    assert agg["accuracy"] == pytest.approx(single["accuracy"])
    assert agg["balanced_accuracy"] == pytest.approx(
        single["balanced_accuracy"])
    np.testing.assert_allclose(agg["iou"], single["iou"], atol=1e-9)
    assert set(agg["areas"]) == {"A", "B"}
    with open(workdir / "all.log") as f:
        assert "Overall Test ::" in f.read()


def test_dataset_use_all_points(processed):
    """use_all_points=True returns full rooms; pad collation batches them."""
    from dgcnn_tpu.data.dataset import FugroDataset

    _, npy_dir = processed
    ds = FugroDataset("train", str(npy_dir), num_point=64,
                      use_all_points=True, seed=1, classes=range(3))
    pts, labels, idx = ds[0]
    assert len(pts) == len(ds.room_points[0])  # every point of the room
    batch = next(ds.batches(2, with_mask=False))
    assert batch.points.shape[0] == 2
    assert batch.mask.sum() > 0


def test_whole_cloud_predict_classify_all(trained, scene_las, workdir):
    """classify_all=True must label every point of every populated block —
    no subsample-and-drop, no duplicated pad points."""
    from dgcnn_tpu.eval.predict import predict
    from dgcnn_tpu.io.las import read_las as _read
    from dgcnn_tpu.prepare.loaders import load_pointcloud

    model_root, _ = trained
    io = IOStream(str(workdir / "predict_all.log"))
    out_las = workdir / "classified_all.las"
    data, preds = predict(
        K, io,
        str(scene_las / "tile.las"),
        str(out_las),
        num_points=NUM_POINTS,
        block_size=20.0,
        num_classes=NUM_CLASSES,
        num_features=4,
        emb_dims=EMB,
        min_class_confidence=0.0,
        model_root=str(model_root),
        batch_size=4,
        classify_all=True,
    )
    raw, _ = load_pointcloud(
        str(scene_las / "tile.las"),
        features_output=["x", "y", "z", "agl"],
        features={"x": 0, "y": 1, "z": 2, "agl": 3},
    )
    # all noise-filtered points that fall in a populated block are labelled;
    # with a 20 m grid over an 80 m scene virtually everything is covered
    assert len(data) > 0.95 * len(raw)
    # no duplicates from chunk padding (a handful of window-boundary points
    # legitimately land in two adjacent inclusive-bound blocks — reference
    # window semantics, pointcloud_util.py:168-170)
    n_dup = len(data) - len(np.unique(data[:, :2], axis=0))
    assert n_dup < 0.001 * len(data), n_dup


def test_multi_area_basename_collision(trained, processed, workdir):
    """List-form test_all with colliding basenames (.../A/npy, .../B/npy)
    must keep both areas, not silently drop one."""
    import shutil

    from dgcnn_tpu.eval.test import test_all

    _, npy_dir = processed
    model_root, _ = trained
    a = workdir / "areaA" / "npy"
    b = workdir / "areaB" / "npy"
    shutil.copytree(npy_dir, a)
    shutil.copytree(npy_dir, b)
    io = IOStream(str(workdir / "coll.log"))
    agg = test_all(
        K, io, [str(a), str(b)],
        num_points=NUM_POINTS, num_classes=NUM_CLASSES, num_features=4,
        test_batch_size=2, emb_dims=EMB, min_class_confidence=0.0,
        model_root=str(model_root), pred_dir=str(workdir / "coll_dumps"),
        validation_prop=0.25, seed=1,
    )
    assert len(agg["areas"]) == 2


def test_predict_point_sharded_whole_cloud(tmp_path):
    """point_shards>1: the whole cloud classifies as ONE block with the
    point axis sharded over the virtual mesh (no 30 m tiling) — every
    input point gets a label, and the result agrees with the unsharded
    whole-cloud forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.eval.predict import predict
    from dgcnn_tpu.io.las import read_las, write_las
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer
    from dgcnn_tpu.utils.logging import IOStream

    rng = np.random.default_rng(0)
    n = 1200
    xy = rng.random((n, 2)) * 40
    z = 0.05 * xy[:, 0] + rng.normal(0, 0.1, n)
    las = tmp_path / "tile.las"
    write_las(str(las), xy[:, 0] + 5e5, xy[:, 1] + 6e6, z,
              np.full(n, 2))

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=32)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state)
    io = IOStream(str(tmp_path / "log.txt"))

    out = tmp_path / "out.las"
    data, pred = predict(
        6, io, str(las), str(out), num_points=64, num_classes=3,
        num_features=4, emb_dims=32, model_label="m",
        model_root=str(tmp_path), knn_impl="xla", point_shards=4,
        min_class_confidence=0.0,
    )
    assert len(pred) == len(data) > 0          # every surviving point
    assert out.exists()
    got = read_las(str(out))
    assert len(got.x) == len(data)

    # unsharded whole-cloud forward agrees (tie-free random data)
    from dgcnn_tpu.models.dgcnn import apply_dgcnn

    x = np.ascontiguousarray(data[:, :4], np.float32)
    x[:, 0] -= x[:, 0].min()
    x[:, 1] -= x[:, 1].min()
    logits, _ = apply_dgcnn(state.params, state.bn_state,
                            jnp.asarray(x)[None], cfg, train=False)
    want = np.asarray(jnp.argmax(logits[0], -1))
    agree = (want == pred).mean()
    assert agree > 0.999, agree


def test_eval_counts_thresholded_points_as_wrong(tmp_path):
    """Confidence-thresholded UNCLASSIFIED(31) predictions must count as
    WRONG in accuracy/balanced accuracy (reference scores all points,
    /root/reference/test.py:164-165) — with an impossible confidence bar
    every point is thresholded and accuracy is exactly 0."""
    import numpy as np

    from dgcnn_tpu.eval.test import test as run_test
    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer
    from dgcnn_tpu.utils.logging import IOStream
    import jax

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(2):
        pts = rng.random((200, 4)) * 30
        labels = rng.integers(0, 3, (200, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=5, emb_dims=32)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state)
    io = IOStream(str(tmp_path / "log.txt"))

    kwargs = dict(
        data_dir=str(data_dir), num_points=32, num_classes=3,
        num_features=4, emb_dims=32, test_batch_size=2, model_label="m",
        model_root=str(tmp_path), knn_impl="xla",
        pred_dir=str(tmp_path / "pred"), validation_prop=0.5, seed=1,
    )
    hard = run_test(5, io, min_class_confidence=1.01, **kwargs)
    assert hard["accuracy"] == 0.0
    assert hard["balanced_accuracy"] == 0.0
    # the (C+1)-wide matrix carries the thresholded counts in the last col
    assert hard["confusion"].shape == (4, 4)
    assert hard["confusion"][:, -1].sum() > 0

    easy = run_test(5, io, min_class_confidence=0.0, **kwargs)
    assert easy["accuracy"] > 0.0
    assert easy["confusion"][:, -1].sum() == 0
