"""Batched evaluation over a processed dataset, with per-room dump files.

Mirrors /root/reference/test.py:17-193: loads the validation partition,
runs batched inference with confidence thresholding (max softmax prob <
min_class_confidence → LAS class 31 UNCLASSIFIED), writes per-room
``Area_{a}_room_{r}_pred_gt.txt`` (x y z pred [gt logits...]) and
``*_true_labels.txt`` dumps, and reports accuracy / balanced accuracy /
confusion matrix / per-class IoU.

Dump format: the first four columns (x y z pred) match the reference
(test.py:145-148) so postprocess tooling is interchangeable; with
``dump_logits=True`` the row becomes ``x y z feat pred gt logits...`` — the
layout the reference's own postprocess scripts actually expect
(/root/reference/postprocess_data/combine_results.py:61-79: xyz 0:3,
aux 3:6, pred 6, gt 7, logits 8:). Columns 3:6 carry the input's non-xyz
feature columns (AGL, and return-number/intensity when the dataset has
them), zero-padded to width 3; columns 8: are RAW logits — downstream
prob_map/combine softmax them exactly once.
"""

from __future__ import annotations

import os
from collections import defaultdict

import jax
import numpy as np

from dgcnn_tpu.data.dataset import FugroDataset
from dgcnn_tpu.models.dgcnn import DGCNNConfig, count_parameters
from dgcnn_tpu.ops.metrics import (
    accuracy_from_confusion,
    balanced_accuracy_from_confusion,
    calculate_sem_iou,
    confusion_matrix,
)
from dgcnn_tpu.utils.logging import IOStream

UNCLASSIFIED = 31


_RESTORE_CACHE: dict = {}


def _restore(cfg: DGCNNConfig, model_root: str, model_label: str, io):
    """Restore params/bn-state from a dgcnn_tpu .npz or a reference .t7.

    Cached on (cfg, file identity): the serve loop restores the same
    model for every tile through a fresh ``predict()`` call (~0.1 s of
    template init + npz decompress each). A changed checkpoint file
    (mtime or size) invalidates its entry; params are never mutated or
    donated downstream, so sharing device arrays across calls is safe."""
    t7 = os.path.join(model_root, f"{model_label}.t7")
    npz = os.path.join(model_root, f"{model_label}.npz")
    path = npz if os.path.exists(npz) else t7
    try:
        st = os.stat(path)
        key = (cfg, os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        raise FileNotFoundError(f"no checkpoint {npz} or {t7}") from None
    hit = _RESTORE_CACHE.get(key)
    if hit is not None:
        io.cprint(f"{os.path.basename(path)} restored.")
        return hit
    if path == npz:
        from dgcnn_tpu.models.dgcnn import init_dgcnn
        from dgcnn_tpu.train.checkpoint import load_named_subtrees

        p_tpl, s_tpl = init_dgcnn(jax.random.key(0), cfg)
        # name-based partial load: works regardless of the training-time
        # optimizer whose state structure we cannot know here
        sub = load_named_subtrees(npz, {"params": p_tpl, "bn_state": s_tpl})
        io.cprint(f"{model_label}.npz restored.")
        out = sub["params"], sub["bn_state"]
    else:
        from dgcnn_tpu.compat.torch_ckpt import load_torch_checkpoint

        ck = load_torch_checkpoint(t7)
        io.cprint(f"{model_label}.t7 restored.")
        out = ck["params"], ck["bn_state"]
    while len(_RESTORE_CACHE) >= 4:  # bound device-memory retention
        _RESTORE_CACHE.pop(next(iter(_RESTORE_CACHE)))
    _RESTORE_CACHE[key] = out
    return out


def test(
    k: int,
    io: IOStream,
    data_dir: str = "",
    num_points: int = 7000,
    num_classes: int = 5,
    num_features: int = 4,
    test_batch_size: int = 8,
    dropout: float = 0.5,
    emb_dims: int = 1024,
    use_all_points: bool = False,
    min_class_confidence: float = 0.8,
    model_label: str = "dgcnn_model",
    model_root: str = "checkpoints/dgcnn",
    pred_dir: str = "predict",
    test_area: str = "1",
    seed: int = 1,
    knn_impl: str = "auto",
    knn_band: int | None = None,
    knn_band_feature: int | None = None,
    knn_band_recall_guard: int | None = None,
    knn_band_recall_threshold: float | None = None,
    knn_band_guard_every: int | None = None,
    knn_share_stage3: bool = False,
    compute_dtype: str | None = None,
    matmul_precision: str | None = None,
    dump_logits: bool = False,
    validation_prop: float = 0.2,
) -> dict:
    """Evaluate a trained model; returns a metrics dict."""
    from dgcnn_tpu.train.steps import make_guarded_predict_step

    cfg = DGCNNConfig(
        num_classes=num_classes, num_features=num_features, k=k,
        dropout=dropout, emb_dims=emb_dims, knn_impl=knn_impl,
        compute_dtype=compute_dtype, matmul_precision=matmul_precision,
        **({} if knn_band is None else {"knn_band": knn_band}),
        **({} if knn_band_feature is None
           else {"knn_band_feature": knn_band_feature}),
        **({} if knn_band_recall_guard is None
           else {"knn_band_recall_guard": knn_band_recall_guard}),
        **({} if knn_band_recall_threshold is None
           else {"knn_band_recall_threshold": knn_band_recall_threshold}),
        **({} if knn_band_guard_every is None
           else {"knn_band_guard_every": knn_band_guard_every}),
        knn_share_stage3=bool(knn_share_stage3),
    )
    dataset = FugroDataset(
        "test", data_dir, num_point=num_points,
        use_all_points=use_all_points, seed=seed,
        validation_prop=validation_prop, classes=range(num_classes),
    )
    os.makedirs(pred_dir, exist_ok=True)
    io.cprint("Start overall evaluation...")
    params, bn_state = _restore(cfg, model_root, model_label, io)
    total, table = count_parameters(params)
    io.cprint(table)
    predict_step, _band_sched = make_guarded_predict_step(
        cfg, min_class_confidence=min_class_confidence,
        unclassified=UNCLASSIFIED,
    )

    io.cprint("Start testing ...")
    # (C+1)-wide matrix: column C collects confidence-thresholded
    # UNCLASSIFIED(31) predictions so they count as WRONG in accuracy and
    # in every class's recall — matching the reference, which scores all
    # points with sklearn (/root/reference/test.py:164-165; a pred of 31
    # never equals a true label). Dropping them would inflate the metrics
    # exactly when the model is unsure.
    cm = np.zeros((num_classes + 1, num_classes + 1))
    room_preds: dict[int, list] = defaultdict(list)
    room_truth: dict[int, list] = defaultdict(list)
    dumps: dict[int, list] = defaultdict(list)
    def _fold(batch, pred, logits):
        """One batch's metric contributions: ``(cm_contribution,
        [(room, pred_rows, truth_rows, dump_row), ...])`` — a pure
        function of (batch, pred, logits), so a guard-repair re-run can
        REPLACE them exactly."""
        bcm = np.asarray(
            confusion_matrix(np.minimum(pred, num_classes), batch.labels,
                             num_classes + 1, weights=batch.mask)
        )
        entries = []
        for i, room in enumerate(np.asarray(batch.room_idx)):
            valid = batch.mask[i] > 0
            row = [batch.points[i][valid][:, :3], pred[i][valid, None]]
            if dump_logits:
                # columns 3:6 = real non-xyz input features (AGL/rni when
                # present), zero-padded to width 3; columns 8: = RAW logits
                feats = batch.points[i][valid][:, 3:6]
                if feats.shape[1] < 3:
                    feats = np.hstack([
                        feats,
                        np.zeros((valid.sum(), 3 - feats.shape[1])),
                    ])
                row = [batch.points[i][valid][:, :3], feats,
                       pred[i][valid, None],
                       batch.labels[i][valid, None].astype(float),
                       logits[i][valid]]
            entries.append((int(room), pred[i][valid],
                            batch.labels[i][valid], np.hstack(row)))
        return bcm, entries

    def batch_iter():
        return dataset.batches(
            test_batch_size, shuffle=False, drop_last=False,
            with_mask=False,
        )

    batch_cms: list = []    # per-dispatch cm contribution (repair undo)
    batch_slots: list = []  # per-dispatch [(room, list position), ...]
    # snapshot the per-sample subsampling RNG: batch ORDER is epoch-keyed,
    # but each __getitem__ draws its point subset from this stateful
    # generator — restoring it makes the repair re-enumeration bit-equal
    _rng_state = dataset.rng.bit_generator.state
    for batch in batch_iter():
        pred, _, logits = predict_step(params, bn_state, batch.points)
        bcm, entries = _fold(batch, np.asarray(pred), np.asarray(logits))
        cm += bcm
        batch_cms.append(bcm)
        slots = []
        for room, p, t, dump_row in entries:
            slots.append((room, len(room_preds[room])))
            room_preds[room].append(p)
            room_truth[room].append(t)
            dumps[room].append(dump_row)
        batch_slots.append(slots)

    # Retroactive repair of the amortized guard's exposure window
    # (mirrors eval/predict.py): with the sampler RNG restored the batch
    # stream re-enumerates bit-identically, so suspect dispatches re-run
    # with the full capped kernel (band_mode=2 — the SAME memoised jit
    # program the wrapper used) and REPLACE their metric contributions;
    # the reported metrics then carry no unguarded banded result.
    # Healthy runs pay one poll of already-computed flags. See
    # BandGuardScheduler.suspect_dispatches.
    redo = set(_band_sched.suspect_dispatches())
    if redo:
        dataset.rng.bit_generator.state = _rng_state
        from dgcnn_tpu.train.steps import make_predict_step

        io.cprint(
            f"feature-band recall guard tripped: re-scoring {len(redo)} "
            "unguarded batch(es) with the full kNN kernel (retroactive "
            "repair of the amortization window)"
        )
        inner = make_predict_step(
            cfg, min_class_confidence=min_class_confidence,
            unclassified=UNCLASSIFIED, band_flag=True,
        )
        m2 = jax.numpy.asarray(2, jax.numpy.int32)
        for bi, batch in enumerate(batch_iter()):
            if bi not in redo:
                continue
            pred, _, logits, _ = inner(params, bn_state, batch.points, m2)
            bcm, entries = _fold(batch, np.asarray(pred),
                                 np.asarray(logits))
            cm += bcm - batch_cms[bi]
            for (room, pos), (_, p, _t, dump_row) in zip(
                batch_slots[bi], entries
            ):
                room_preds[room][pos] = p
                dumps[room][pos] = dump_row

    for room, rows in dumps.items():
        arr = np.vstack(rows)
        path = os.path.join(
            pred_dir, f"Area_{test_area}_room_{room}_pred_gt.txt"
        )
        np.savetxt(path, arr, fmt="%f")
        truth = np.concatenate(room_truth[room])
        np.savetxt(
            os.path.join(
                pred_dir, f"Area_{test_area}_room_{room}_true_labels.txt"
            ),
            truth[:, None], fmt="%d",
        )

    acc = float(accuracy_from_confusion(cm))
    bacc = float(balanced_accuracy_from_confusion(cm))
    io.cprint(
        "Test :: test area: %s, test acc: %.6f, test avg acc: %.6f"
        % (test_area, acc, bacc)
    )
    io.cprint("Confusion matrix:")
    io.cprint(str(cm.astype(np.int64)))
    ious = calculate_sem_iou(
        [np.concatenate(room_preds[r]) for r in sorted(room_preds)],
        [np.concatenate(room_truth[r]) for r in sorted(room_truth)],
        num_classes,
    )
    io.cprint(f"per-class IoU: {ious}")
    return {
        "accuracy": acc,
        "balanced_accuracy": bacc,
        "confusion": cm,
        "iou": ious,
        "mean_iou": float(np.nanmean(ious)),
        # dispatches re-scored by the amortized-guard retroactive repair
        # (0 on healthy data or when the guard isn't amortized)
        "band_repaired": len(redo),
    }


def test_all(
    k: int,
    io: IOStream,
    data_dirs: "dict[str, str] | list[str]",
    **kwargs,
) -> dict:
    """Aggregate evaluation across multiple area datasets — the
    ``test_area == 'all'`` branch (/root/reference/test.py:182-193): run
    each area, then report overall accuracy / balanced accuracy / mean IoU
    over the union of all points.

    ``data_dirs``: {area_name: npy_dir} (a list uses each dir's basename as
    the area name). All metrics derive from the summed confusion matrix —
    identical to concatenating every room's preds/labels as the reference
    does, without holding them in memory.
    """
    if not isinstance(data_dirs, dict):
        named = {}
        for i, d in enumerate(data_dirs):
            name = os.path.basename(os.path.normpath(d)) or str(i)
            if name in named:  # e.g. .../Area_1/npy and .../Area_2/npy
                name = os.path.normpath(d).replace(os.sep, "_").lstrip("_")
            named[name] = d
        data_dirs = named
        if len(data_dirs) != len(list(dict.fromkeys(data_dirs.values()))):
            raise ValueError(f"duplicate data dirs in {list(data_dirs)}")
    kwargs.pop("test_area", None)
    cm_sum = None
    per_area = {}
    for area, d in data_dirs.items():
        m = test(k, io, data_dir=d, test_area=area, **kwargs)
        per_area[area] = m
        cm_sum = m["confusion"] if cm_sum is None else cm_sum + m["confusion"]
    acc = float(accuracy_from_confusion(cm_sum))
    bacc = float(balanced_accuracy_from_confusion(cm_sum))
    from dgcnn_tpu.ops.metrics import iou_from_confusion

    # the trailing row/col is the UNCLASSIFIED(31) bucket (see test()) —
    # not a real class; slice it off the per-class IoUs
    ious = np.asarray(iou_from_confusion(cm_sum))[: cm_sum.shape[0] - 1]
    io.cprint(
        "Overall Test :: test acc: %.6f, test avg acc: %.6f, test iou: %.6f"
        % (acc, bacc, float(np.nanmean(ious)))
    )
    return {
        "accuracy": acc,
        "balanced_accuracy": bacc,
        "confusion": cm_sum,
        "iou": ious,
        "mean_iou": float(np.nanmean(ious)),
        "areas": per_area,
    }


def test_args(args, io: IOStream) -> dict:
    """CLI adapter (/root/reference/test.py:195-221). ``--validation_area
    all`` aggregates across comma-separated ``--data_dir`` entries."""
    area = getattr(args, "validation_area", "1")
    if area == "all":
        dirs = [d for d in str(args.data_dir).split(",") if d]
        return test_all(
            args.k,
            io,
            dirs,
            num_points=args.num_points,
            num_classes=args.num_classes,
            num_features=args.num_features,
            test_batch_size=args.test_batch_size,
            dropout=args.dropout,
            emb_dims=args.emb_dims,
            use_all_points=args.use_all_points,
            min_class_confidence=args.min_class_confidence,
            model_label=args.model_label,
            model_root=args.model_root,
            pred_dir=args.test_visu_dir,
            seed=args.seed,
            knn_impl=getattr(args, "knn_impl", "auto"),
            knn_band=getattr(args, "knn_band", None),
            knn_band_feature=getattr(args, "knn_band_feature", None),
            knn_band_recall_guard=getattr(
                args, "knn_band_recall_guard", None),
            knn_band_recall_threshold=getattr(
                args, "knn_band_recall_threshold", None),
            knn_band_guard_every=getattr(
                args, "knn_band_guard_every", None),
            knn_share_stage3=getattr(args, "knn_share_stage3", False),
            compute_dtype=getattr(args, "compute_dtype", None),
            matmul_precision=getattr(args, "matmul_precision", None),
            validation_prop=args.validation_prop,
        )
    return test(
        args.k,
        io,
        data_dir=args.data_dir,
        num_points=args.num_points,
        num_classes=args.num_classes,
        num_features=args.num_features,
        test_batch_size=args.test_batch_size,
        dropout=args.dropout,
        emb_dims=args.emb_dims,
        use_all_points=args.use_all_points,
        min_class_confidence=args.min_class_confidence,
        model_label=args.model_label,
        model_root=args.model_root,
        pred_dir=args.test_visu_dir,
        test_area=getattr(args, "validation_area", "1"),
        seed=args.seed,
        knn_impl=getattr(args, "knn_impl", "auto"),
        knn_band=getattr(args, "knn_band", None),
        knn_band_feature=getattr(args, "knn_band_feature", None),
        knn_band_recall_guard=getattr(args, "knn_band_recall_guard", None),
        knn_band_recall_threshold=getattr(
            args, "knn_band_recall_threshold", None),
        knn_band_guard_every=getattr(args, "knn_band_guard_every", None),
        knn_share_stage3=getattr(args, "knn_share_stage3", False),
        compute_dtype=getattr(args, "compute_dtype", None),
        matmul_precision=getattr(args, "matmul_precision", None),
        validation_prop=args.validation_prop,
    )
