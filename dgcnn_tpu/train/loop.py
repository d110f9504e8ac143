"""The training driver — reference ``train()`` semantics, TPU executor.

Mirrors /root/reference/train.py:18-318 (keyword surface included) with the
intended-semantics fixes documented in SURVEY.md §2:

* the LR schedule actually steps (per epoch);
* loss on logits over class-balance-masked points (no double softmax, no
  synthetic ignore-class channel);
* metrics from on-device confusion matrices (one scatter-add per step)
  instead of per-batch host sklearn;
* checkpoint = whole TrainState (params, BN stats, optimizer state, PRNG,
  step) — best-balanced-accuracy-only policy with epoch resume.

Distribution: when more than one device is visible the batch is sharded
over the mesh 'data' axis and the jitted step lets XLA insert the psums.
"""

from __future__ import annotations

import os
import time
from typing import Sequence

import jax
import numpy as np

from dgcnn_tpu.data.dataset import FugroDataset
from dgcnn_tpu.data.prefetch import prefetch_to_device
from dgcnn_tpu.models.dgcnn import DGCNNConfig, count_parameters
from dgcnn_tpu.ops.metrics import (
    accuracy_from_confusion,
    balanced_accuracy_from_confusion,
    iou_from_confusion,
)
from dgcnn_tpu.train.checkpoint import save_checkpoint_auto, try_resume
from dgcnn_tpu.train.steps import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from dgcnn_tpu.parallel.distributed import all_processes_agree
from dgcnn_tpu.utils.logging import IOStream, NullWriter, ScalarWriter


def _device_put_sharded(batch_arrays, mesh):
    if mesh is None:
        return batch_arrays
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]
    repl = NamedSharding(mesh, P())
    if len(batch_arrays[0]) % n_data:
        # partial batch (e.g. validation tail with drop_last=False) cannot
        # shard evenly — replicate instead; correctness over speed here
        shard = repl
    else:
        shard = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        # multi-host: device_put cannot target non-addressable devices;
        # each process donates its own row block (or the full array for
        # replication) — every process iterates the same deterministic
        # global batch, so the pieces assemble consistently
        from dgcnn_tpu.parallel.distributed import make_global_batch

        return make_global_batch(batch_arrays, shard,
                                 replicate=shard is repl)
    return tuple(jax.device_put(a, shard) for a in batch_arrays)


def train(
    k: int,
    io: IOStream,
    data_dir: str = "",
    num_points: int = 7000,
    epochs: int = 30,
    num_classes: int = 5,
    num_features: int = 4,
    train_batch_size: int = 8,
    validation_batch_size: int = 8,
    use_sgd: bool = False,
    lr: float = 0.001,
    momentum: float = 0.9,
    dropout: float = 0.5,
    emb_dims: int = 1024,
    scheduler: str = "cos",
    validation_prop: float = 0.2,
    use_all_points: bool = False,
    model_label: str = "dgcnn_model",
    exclude_classes: Sequence[int] = (),
    model_root: str = "checkpoints/dgcnn",
    exp_name: str = "DGCNN_Training",
    tb_dir: str = "tensorboard_logs",
    seed: int = 1,
    knn_impl: str = "auto",
    knn_train_unroll: "bool | str" = "auto",
    knn_band: int | None = None,
    knn_band_feature: int | None = None,
    knn_band_recall_guard: int | None = None,
    knn_band_recall_threshold: float | None = None,
    knn_band_guard_every: int | None = None,
    knn_share_stage3: bool = False,
    compute_dtype: str | None = None,
    matmul_precision: str | None = None,
    data_parallel: bool = True,
    tensor_parallel: int = 1,
    point_shards: int = 1,
    smoothing: bool = True,
    device_masks: bool = False,
    remat: "bool | str" = False,
    grad_accum: int = 1,
    patience: int | None = None,
) -> dict:
    """Train a DGCNN. Returns a summary dict (best balanced accuracy etc.).

    Keyword surface follows /root/reference/train.py:18-41 (cuda/thread
    knobs dropped — device selection is JAX's; seed/knn_impl/compute_dtype
    added).
    """
    cfg = DGCNNConfig(
        num_classes=num_classes,
        num_features=num_features,
        k=k,
        dropout=dropout,
        emb_dims=emb_dims,
        knn_impl=knn_impl,
        knn_train_unroll=False,  # resolved below, after steps_per_epoch
        compute_dtype=compute_dtype,
        matmul_precision=matmul_precision,
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
    train_data = FugroDataset(
        "train", data_dir, num_point=num_points,
        use_all_points=use_all_points, validation_prop=validation_prop,
        classes=range(num_classes), seed=seed,
    )
    val_data = None
    if validation_prop > 0:
        try:
            val_data = FugroDataset(
                "validation", data_dir, num_point=num_points,
                validation_prop=validation_prop, classes=range(num_classes),
                seed=seed,
            )
        except ValueError:
            pass  # too few rooms for a validation draw
    io.cprint(f"Totally {len(train_data)} samples in train set.")
    io.cprint(
        f"Totally {len(val_data) if val_data else 0} samples in "
        "validation set."
    )
    if val_data is None:
        io.cprint("no validation split — checkpointing on train metrics")

    if len(train_data) < train_batch_size:
        # fixed-shape batching drops partial batches (drop_last): every
        # epoch would silently iterate ZERO batches and "train" nothing
        raise ValueError(
            f"train split has {len(train_data)} samples < train_batch_size "
            f"{train_batch_size} — no full batch can form; lower "
            "train_batch_size (or validation_prop)"
        )
    steps_per_epoch = max(len(train_data) // train_batch_size, 1)

    # knn_train_unroll="auto": run the python-unrolled capped-kNN train
    # kernel (saves ~5 ms/step) exactly when an earlier run proved the
    # persistent compilation cache is warm for this program shape; the
    # one-time Mosaic compile is only ever paid by an explicit
    # knn_train_unroll=True run, which seeds the marker. The key must hash
    # EVERYTHING that reaches the jitted step's HLO — including
    # steps_per_epoch (baked into the cosine schedule's constants), which
    # is why resolution waits until the dataset size is known.
    import dataclasses as _dc

    from dgcnn_tpu.utils.compilation_cache import (
        is_warm,
        mark_warm,
        warm_key,
    )

    unroll_key = warm_key(
        "train-unroll", k, num_points, num_classes, num_features, emb_dims,
        dropout, knn_impl, compute_dtype, matmul_precision, train_batch_size,
        grad_accum, remat, smoothing, device_masks, tuple(exclude_classes),
        use_sgd, lr, momentum, scheduler, epochs, steps_per_epoch,
        # parallel layout changes the partitioned program; ragged
        # use_all_points mode compiles one program per shape bucket
        len(jax.devices()), data_parallel, tensor_parallel, use_all_points,
        # graph-construction knobs change the traced kNN program too
        cfg.knn_band, cfg.knn_band_feature, cfg.knn_share_stage3,
        cfg.knn_band_cap, cfg.knn_band_nwin,
        cfg.knn_band_recall_guard, cfg.knn_band_recall_threshold,
        cfg.knn_band_guard_every,
    )
    if knn_train_unroll == "auto":
        knn_train_unroll = is_warm(unroll_key)
    elif isinstance(knn_train_unroll, str):
        knn_train_unroll = knn_train_unroll.lower() in ("1", "true", "yes")
    cfg = _dc.replace(cfg, knn_train_unroll=bool(knn_train_unroll))

    tx = make_optimizer(
        use_sgd=use_sgd, lr=lr, momentum=momentum, scheduler=scheduler,
        epochs=epochs, steps_per_epoch=steps_per_epoch,
    )
    io.cprint("Use SGD" if use_sgd else "Use Adam")
    state = init_train_state(jax.random.key(seed), cfg, tx)
    total, table = count_parameters(state.params)
    io.cprint(table)

    mesh = None
    tp = int(tensor_parallel)
    sp = int(point_shards)
    if jax.process_count() > 1:
        # multi-host state placement goes through process-local donation
        # (put_replicated/make_global_batch) — only the DP path has that
        # wiring; TP/point-sharded state placement uses device_put, which
        # cannot target non-addressable devices. And an unsharded
        # multi-host run would silently train per-process copies.
        if tp > 1 or sp > 1:
            raise ValueError(
                "multi-host training supports the data-parallel path "
                "only (tensor_parallel=1, point_shards=1)")
        if not data_parallel:
            raise ValueError("multi-host training requires data_parallel")
        if train_batch_size % len(jax.devices()):
            raise ValueError(
                f"multi-host: train_batch_size {train_batch_size} must "
                f"divide over {len(jax.devices())} global devices")
    if sp > 1:
        # POINT-SHARDED training (sequence parallelism): whole-cloud
        # fine-tuning at block sizes one chip cannot hold — the CLI
        # analogue of removing the reference's 30 m tiling cap for
        # training too (/root/reference/prepare_data/
        # pointcloud_util.py:97-192). Ring kNN + sharded BN/max-pool live
        # in parallel/sharded_model.py; params stay replicated.
        from dgcnn_tpu.parallel.mesh import make_mesh, replicated_sharding

        if tp > 1:
            raise ValueError("point_shards and tensor_parallel are "
                             "mutually exclusive (both use the mesh's "
                             "'points' axis)")
        if grad_accum != 1 or device_masks or (remat and remat != "off"):
            raise ValueError(
                "point_shards supports the plain step only (grad_accum=1, "
                "device_masks=False, remat off)")
        n_dev = len(jax.devices())
        if n_dev % sp:
            raise ValueError(
                f"point_shards={sp} does not divide {n_dev} devices")
        if num_points % sp:
            raise ValueError(
                f"num_points={num_points} not divisible by "
                f"point_shards={sp}")
        if train_batch_size % (n_dev // sp) or (
                validation_prop > 0
                and validation_batch_size % (n_dev // sp)):
            # shard_map's P("data", ...) specs are a hard divisibility
            # requirement (no replicate fallback exists for them);
            # validation TAIL batches are handled by mask-padding below
            raise ValueError(
                f"point_shards={sp} on {n_dev} devices leaves a data axis "
                f"of {n_dev // sp}: train/validation batch sizes must be "
                "divisible by it")
        mesh = make_mesh(n_data=n_dev // sp, n_points=sp)
        state = jax.device_put(state, replicated_sharding(mesh))
        io.cprint(f"point-sharded training: {sp}-way sequence parallel, "
                  f"data-parallel over {n_dev // sp}")
    elif tp > 1:
        # TP (annotation-only channel sharding of the conv6/bn6/conv7
        # trunk, parallel/tensor_parallel.py) reuses the mesh's 'points'
        # axis; batch rides 'data'. The optimizer state is re-initialised
        # from the placed params so Adam moments inherit the shardings
        # (zeros_like preserves placement) — resume below then restores
        # onto exactly these shardings.
        import dataclasses as _dc

        from dgcnn_tpu.parallel.mesh import make_mesh, replicated_sharding
        from dgcnn_tpu.parallel.tensor_parallel import shard_params_tp

        n_dev = len(jax.devices())
        if n_dev % tp:
            raise ValueError(
                f"tensor_parallel={tp} does not divide {n_dev} devices")
        mesh = make_mesh(n_data=n_dev // tp, n_points=tp)
        state = jax.device_put(state, replicated_sharding(mesh))
        p_tp, s_tp = shard_params_tp(state.params, state.bn_state, mesh)
        state = _dc.replace(state, params=p_tp, bn_state=s_tp,
                            opt_state=tx.init(p_tp))
        io.cprint(f"tensor-parallel trunk over {tp} devices, "
                  f"data-parallel over {n_dev // tp}")
    elif data_parallel and len(jax.devices()) > 1:
        from dgcnn_tpu.parallel.mesh import make_mesh, replicated_sharding

        n_dev = len(jax.devices())
        if train_batch_size % n_dev == 0:
            mesh = make_mesh(n_data=n_dev)
            repl = replicated_sharding(mesh)
            if jax.process_count() > 1:
                # multi-host: replicate through the process-local API
                # (device_put cannot target non-addressable devices);
                # deterministic seeding makes every process's init equal
                from dgcnn_tpu.parallel.distributed import put_replicated

                state = put_replicated(state, repl)
                io.cprint(
                    f"data-parallel over {n_dev} devices across "
                    f"{jax.process_count()} processes")
            else:
                state = jax.device_put(state, repl)
                io.cprint(f"data-parallel over {n_dev} devices")

    ckpt_path = os.path.join(model_root, f"{model_label}.npz")
    start_epoch, best_bacc = 0, 0.0
    resumed = try_resume(ckpt_path, state)
    if resumed is not None:
        state, meta = resumed
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_bacc = float(meta.get("mBPCA", 0.0))
        io.cprint("Use pretrained model")
    else:
        io.cprint("No existing model, starting training from scratch...")

    exclude = tuple(int(c) for c in exclude_classes if int(c) >= 0)
    if sp > 1:
        from dgcnn_tpu.parallel.sharded_model import (
            make_sharded_eval_step,
            make_sharded_train_step,
        )

        train_step = make_sharded_train_step(cfg, tx, mesh,
                                             smoothing=smoothing)
        eval_step = make_sharded_eval_step(cfg, mesh, smoothing=smoothing)
        # the point-sharded forward builds exact per-stage ring-kNN graphs
        # (parallel/ring_knn.py cert) — no feature band to guard
        band_sched = val_band_sched = None
    else:
        # amortized feature-band recall guard (steps.py::
        # BandGuardScheduler): guard every Nth train step, sticky
        # fallback for the rest of the EPOCH on a trip, re-armed each
        # epoch (the learned features move between epochs)
        from dgcnn_tpu.train.steps import (
            BandGuardScheduler,
            make_guarded_eval_step,
        )

        band_sched = BandGuardScheduler(cfg)
        train_step = make_train_step(
            cfg, tx, smoothing=smoothing, device_masks=device_masks,
            exclude_classes=exclude, remat=remat, grad_accum=grad_accum,
            band_guard=band_sched.active,
        )
        eval_step, val_band_sched = make_guarded_eval_step(
            cfg, smoothing=smoothing)
    # one scalar log per RUN: non-zero processes would race process 0 on
    # the same event/JSONL files (shared fs) for byte-identical values
    writer = (ScalarWriter(os.path.join(tb_dir, exp_name))
              if jax.process_index() == 0 else NullWriter())

    summary = {}
    niter = start_epoch * steps_per_epoch * train_batch_size
    epochs_since_best = 0
    unroll_marked = False
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        cm_sum = np.zeros((num_classes, num_classes))
        loss_sum, count = 0.0, 0
        batch_iter = prefetch_to_device(
            train_data.batches(
                train_batch_size, epoch=epoch, exclude_classes=exclude,
                with_mask=not device_masks,
            ),
            size=2,
            transfer=lambda b: (
                b,
                _device_put_sharded((b.points, b.labels, b.mask), mesh),
            ),
        )
        if band_sched is not None:
            band_sched.rearm()
        for batch, (pts, labels, mask) in batch_iter:
            guarded = False
            if band_sched is not None and band_sched.active:
                mode, guarded = band_sched.next_mode()
                state, metrics = train_step(state, pts, labels, mask, mode)
            else:
                state, metrics = train_step(state, pts, labels, mask)
            loss = float(metrics["loss"])
            if guarded:
                # the loss pull above already synced this step — reading
                # the trip flag is free
                band_sched.observe(metrics["band_tripped"])
            if not np.isfinite(loss):
                # failure detection: a non-finite loss poisons Adam moments
                # and every later step — stop loudly instead of training on
                # garbage (the best-only checkpoint keeps the last good
                # state on disk for resume)
                raise FloatingPointError(
                    f"non-finite loss {loss} at epoch {epoch} step "
                    f"{int(state.step)}; last good checkpoint: {ckpt_path}"
                )
            if cfg.knn_train_unroll and not unroll_marked:
                # first unrolled step done -> the persistent cache now
                # holds the compiled program; future "auto" runs of this
                # config pick the unrolled kernel for free
                mark_warm(unroll_key)
                unroll_marked = True
            cm_sum += np.asarray(metrics["confusion"])
            loss_sum += loss * len(batch.points)
            count += len(batch.points)
            niter += len(batch.points)
            writer.add_scalar("Train/loss", loss, niter)
        train_acc = float(accuracy_from_confusion(cm_sum))
        train_bacc = float(balanced_accuracy_from_confusion(cm_sum))
        io.cprint(
            "Train %d, loss: %.6f, train acc: %.6f, train avg acc: %.6f"
            % (epoch, loss_sum / max(count, 1), train_acc, train_bacc)
        )
        writer.add_scalar("Train/accuracy", train_acc, epoch)
        writer.add_scalar("Train/balanced_accuracy", train_bacc, epoch)

        # validation (falls back to train metrics when no split exists)
        if val_data is not None:
            if val_band_sched is not None:
                val_band_sched.rearm()
            cm_sum = np.zeros((num_classes, num_classes))
            loss_sum, count = 0.0, 0
            for batch in val_data.batches(
                validation_batch_size, epoch=epoch, with_mask=False,
                shuffle=False, drop_last=False,
            ):
                b_pts, b_lab, b_msk = batch.points, batch.labels, batch.mask
                if sp > 1 and len(b_pts) % mesh.shape["data"]:
                    # shard_map specs need the batch axis divisible by the
                    # data axis; pad the tail batch with mask-0 rows —
                    # loss and confusion are mask-weighted, so metrics
                    # are unchanged
                    pad = -len(b_pts) % mesh.shape["data"]
                    b_pts = np.concatenate(
                        [b_pts, np.zeros((pad,) + b_pts.shape[1:],
                                         b_pts.dtype)])
                    b_lab = np.concatenate(
                        [b_lab, np.zeros((pad,) + b_lab.shape[1:],
                                         b_lab.dtype)])
                    b_msk = np.concatenate(
                        [b_msk, np.zeros((pad,) + b_msk.shape[1:],
                                         b_msk.dtype)])
                pts, labels, mask = _device_put_sharded(
                    (b_pts, b_lab, b_msk), mesh
                )
                out = eval_step(state.params, state.bn_state, pts, labels,
                                mask)
                cm_sum += np.asarray(out["confusion"])
                loss_sum += float(out["loss"]) * len(batch.points)
                count += len(batch.points)
            val_acc = float(accuracy_from_confusion(cm_sum))
            val_bacc = float(balanced_accuracy_from_confusion(cm_sum))
            val_miou = float(np.nanmean(np.asarray(iou_from_confusion(cm_sum))))
            io.cprint(
                "Test %d, loss: %.6f, test acc: %.6f, test avg acc: %.6f, "
                "test mIoU: %.6f"
                % (epoch, loss_sum / max(count, 1), val_acc, val_bacc,
                   val_miou)
            )
            writer.add_scalar("Test/mean_iou", val_miou, epoch)
        else:
            val_acc, val_bacc = train_acc, train_bacc
        writer.add_scalar("Test/accuracy", val_acc, epoch)
        writer.add_scalar("Test/balanced_accuracy", val_bacc, epoch)
        writer.add_scalar("epoch_seconds", time.time() - t0, epoch)

        # multi-host: the checkpoint save is COLLECTIVE (every process
        # persists its own shards), so the save DECISION must be uniform.
        # This agreement check must run UNCONDITIONALLY each epoch — if it
        # lived inside the divergence-dependent branch below, the very
        # divergence it guards against would deadlock the job (one
        # process entering the allgather while another skips it).
        if not all_processes_agree(val_bacc):
            raise RuntimeError(
                "cross-process metric divergence: processes computed "
                f"different validation balanced accuracies at epoch "
                f"{epoch} — data order or sharding is broken; refusing "
                "to checkpoint")
        if val_bacc > best_bacc:
            best_bacc = val_bacc
            epochs_since_best = 0
            io.cprint(f"Saving the best model at {ckpt_path}")
            save_checkpoint_auto(ckpt_path, state, epoch=epoch,
                                 mBPCA=best_bacc)
        else:
            epochs_since_best += 1
        summary = {
            "epoch": epoch,
            "best_balanced_accuracy": best_bacc,
            "val_accuracy": val_acc,
            "val_balanced_accuracy": val_bacc,
            "params": total,
        }
        if patience is not None and epochs_since_best >= patience:
            io.cprint(
                f"early stop: no validation improvement for {patience} "
                f"epochs (best {best_bacc:.6f})"
            )
            break
    writer.close()
    return summary


def train_args(args, io: IOStream) -> dict:
    """CLI adapter (/root/reference/train.py:320-356)."""
    if isinstance(args.exclude_classes, list):
        exclude = [i for i in args.exclude_classes if i >= 0]
    else:
        exclude = []
    return train(
        args.k,
        io,
        data_dir=args.data_dir,
        num_points=args.num_points,
        epochs=args.epochs,
        num_classes=args.num_classes,
        num_features=args.num_features,
        train_batch_size=args.batch_size,
        validation_batch_size=args.validation_batch_size,
        use_sgd=args.use_sgd,
        lr=args.lr,
        momentum=args.momentum,
        dropout=args.dropout,
        emb_dims=args.emb_dims,
        scheduler=args.scheduler,
        validation_prop=args.validation_prop,
        use_all_points=args.use_all_points,
        model_label=args.model_label,
        exclude_classes=exclude,
        model_root=args.model_root,
        exp_name=args.exp_name,
        tb_dir=args.tb_dir,
        seed=args.seed,
        knn_impl=getattr(args, "knn_impl", "auto"),
        compute_dtype=getattr(args, "compute_dtype", None),
        matmul_precision=getattr(args, "matmul_precision", None),
        remat=getattr(args, "remat", False),
        grad_accum=getattr(args, "grad_accum", 1),
        knn_train_unroll=getattr(args, "knn_train_unroll", False),
        knn_band=getattr(args, "knn_band", None),
        knn_band_feature=getattr(args, "knn_band_feature", None),
        knn_band_recall_guard=getattr(args, "knn_band_recall_guard", None),
        knn_band_guard_every=getattr(args, "knn_band_guard_every", None),
        knn_band_recall_threshold=getattr(
            args, "knn_band_recall_threshold", None),
        knn_share_stage3=getattr(args, "knn_share_stage3", False),
        tensor_parallel=getattr(args, "tensor_parallel", 1),
        point_shards=getattr(args, "point_shards", 1),
        patience=getattr(args, "patience", None),
    )
