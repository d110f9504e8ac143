"""Jitted train/eval steps and reference-matching optimizers.

Reference training semantics (/root/reference/train.py:18-318), intended
form (SURVEY.md §2 bug list):

* Adam(lr, weight_decay=1e-4) or SGD(lr*100, momentum, weight_decay=1e-4)
  (train.py:113-118). torch's ``weight_decay`` is L2-into-gradient, which is
  ``optax.add_decayed_weights`` *before* the Adam/momentum scaling.
* CosineAnnealingLR(T_max=epochs, eta_min=1e-3) stepped per epoch, or
  StepLR(step=20, gamma=0.5) with the 1e-5 floor applied at
  train.py:230-234. (The reference rebinds ``scheduler`` and never actually
  steps it — we implement the intended schedule.)
* loss: label-smoothed CE on *logits* over class-balance-masked points
  (the intended semantics of the focus-label remap, train.py:167-197).

Everything per-batch runs inside one jit: forward (training BatchNorm),
loss, backward, optimizer update and on-device confusion-matrix metrics.
Under a data-sharded batch jit inserts the gradient/metric psums.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.ops.losses import masked_smoothed_cross_entropy
from dgcnn_tpu.ops.metrics import confusion_matrix


class BandGuardScheduler:
    """Host side of the AMORTIZED feature-band recall guard
    (``DGCNNConfig.knn_band_guard_every``): pay the guard's probe kernels
    on every Nth dispatch (``band_mode=1``), skip them on the others
    (``band_mode=0``), and go STICKY to the full capped kernel
    (``band_mode=2``) for the rest of the loop once a guarded dispatch
    measures recall below the threshold. Trip flags are polled
    NON-blocking (``jax.Array.is_ready``) so async dispatch loops
    (eval/predict.py keeps a window of in-flight batches) never sync on
    the guard; a trip therefore applies from the first dispatch issued
    after its flag lands — the exposure window is the already-queued
    dispatches plus up to N-1 unguarded dispatches per guard period (on
    healthy geometry guarded and unguarded dispatches are BIT-IDENTICAL;
    the in-graph fallback already protected the tripping batch itself).
    Loops that can re-run batches close that window RETROACTIVELY via
    :meth:`suspect_dispatches` (predict() AND eval's test() re-run the
    suspect batches with the full kernel and overwrite — every result is
    then either probe-guarded itself, full-kernel, or bracketed by clean
    guards on both sides).
    ``rearm()`` re-trusts the band: training calls it each epoch because
    the learned features move between epochs.

    ``active`` is False when the config doesn't amortize
    (``cfg._guard_amortized``); every method is then inert, so callers
    can construct one unconditionally."""

    # dispatches a pending unpolled trip flag may age before observe()
    # force-drains it (blocking): flags are produced once per guard
    # period, so by the time this many have queued the oldest is long
    # since computed and the bool() is effectively free
    _MAX_PENDING = 32

    def __init__(self, cfg: DGCNNConfig):
        self.every = int(getattr(cfg, "knn_band_guard_every", 1))
        self.active = bool(cfg._guard_amortized)
        self._i = 0
        self._tripped = False
        self._pending: list = []  # (dispatch_idx, flag) in dispatch order
        self._modes = None  # lazily-built device constants for 0/1/2
        self._modes_log: list = []  # int mode per dispatch index
        self._guard_queue: list = []  # guarded idxs awaiting observe()
        self._last_clean = -1  # idx of last guarded dispatch seen clean

    @property
    def tripped(self) -> bool:
        """Whether any guarded dispatch so far measured a recall failure
        (BLOCKS on still-in-flight guard flags)."""
        self._poll(block=True)
        return self._tripped

    def _resolve(self, idx: int, failed: bool) -> None:
        if failed:
            self._tripped = True
        else:
            self._last_clean = max(self._last_clean, idx)

    def _poll(self, block: bool = False) -> None:
        still = []
        for idx, f in self._pending:
            ready = block
            if not ready:
                is_ready = getattr(f, "is_ready", None)
                # unknown array types (no is_ready): KEEP pending rather
                # than bool()-blocking here — a silent sync would collapse
                # the async dispatch window this polling exists to protect;
                # observe()'s _MAX_PENDING drain and .tripped's block=True
                # path still consume them
                ready = is_ready() if callable(is_ready) else False
            if ready:
                self._resolve(idx, bool(f))
            else:
                still.append((idx, f))
        self._pending = still

    def next_mode(self) -> tuple[jax.Array, bool]:
        """``(band_mode int32 scalar, guarded)`` for the next dispatch.
        When ``guarded``, the caller must hand the dispatch's trip flag
        back via :meth:`observe`."""
        self._poll()
        if self._tripped:
            mode, guarded = 2, False
        elif self._i % self.every == 0:
            mode, guarded = 1, True
        else:
            mode, guarded = 0, False
        if guarded:
            self._guard_queue.append(self._i)
        self._modes_log.append(mode)
        self._i += 1
        if self._modes is None:
            # cached device constants — a fresh jnp.asarray per dispatch
            # would pay a host->device transfer on every step
            self._modes = tuple(jnp.asarray(m, jnp.int32)
                                for m in (0, 1, 2))
        return self._modes[mode], guarded

    def observe(self, flag: jax.Array) -> None:
        # flags arrive in dispatch order (one observe per guarded
        # next_mode); pair each with its guarded dispatch index
        idx = self._guard_queue.pop(0) if self._guard_queue else self._i - 1
        self._pending.append((idx, flag))
        if len(self._pending) > self._MAX_PENDING:
            old_idx, old = self._pending.pop(0)
            self._resolve(old_idx, bool(old))  # blocks; see _MAX_PENDING

    def suspect_dispatches(self) -> list:
        """After a dispatch loop has fully drained: the dispatch indices
        whose results a trip calls into question — every unguarded banded
        (mode-0) dispatch issued after the last guarded dispatch that
        measured CLEAN. Empty when no guard ever tripped (the healthy
        path costs one poll of already-computed flags; BLOCKS only on
        flags still in flight). Callers close the amortization exposure
        window retroactively by re-running these with ``band_mode=2`` and
        overwriting (eval/predict.py does) — every result is then either
        probe-guarded itself, full-kernel, or bracketed by clean guards."""
        self._poll(block=True)
        if not self._tripped:
            return []
        return [i for i, m in enumerate(self._modes_log)
                if m == 0 and i > self._last_clean]

    def rearm(self) -> None:
        self._i = 0
        self._tripped = False
        self._pending = []
        self._modes_log = []
        self._guard_queue = []
        self._last_clean = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Complete training state — a single pytree, trivially checkpointable."""

    params: Any
    bn_state: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array  # int32 scalar


def cosine_annealing(lr0: float, epochs: int, eta_min: float = 1e-3):
    """torch CosineAnnealingLR(T_max=epochs, eta_min) as an epoch->lr fn."""

    def schedule(epoch):
        t = jnp.minimum(epoch, epochs)
        return eta_min + (lr0 - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / epochs))

    return schedule


def step_lr(lr0: float, step_size: int = 20, gamma: float = 0.5,
            floor: float = 1e-5):
    """torch StepLR with the reference's explicit 1e-5 floor
    (/root/reference/train.py:230-234)."""

    def schedule(epoch):
        return jnp.maximum(lr0 * gamma ** (epoch // step_size), floor)

    return schedule


def make_optimizer(
    *,
    use_sgd: bool = False,
    lr: float = 1e-3,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    scheduler: str = "cos",
    epochs: int = 30,
    steps_per_epoch: int = 1,
    flatten: bool = False,
) -> optax.GradientTransformation:
    """Reference-matching optimizer. The schedule is evaluated per optimizer
    step but changes value once per epoch (epoch = step // steps_per_epoch),
    matching per-epoch ``scheduler.step()`` semantics.

    ``flatten=True`` wraps the chain in :func:`optax.flatten`: the update
    runs on ONE concatenated parameter vector instead of ~50 per-leaf ops.
    Every transform in the chain is elementwise (L2 decay, Adam/momentum
    moments, schedule scaling), so the flattened update is the same
    arithmetic per element (tests/test_train.py asserts it). MEASURED A
    WASH on-device (scripts/exp_opt_flatten.py: 63.6 vs 63.7 ms full train
    step, interleaved trials) — the whole step is one jit'd XLA program, so
    the per-leaf updates are already fused, not host-launch-bound. Default
    False: flattening changes the ``opt_state`` checkpoint layout (flat
    moment vectors) for zero gain, and concatenation would force a
    resharding gather when leaves carry heterogeneous shardings (the
    tensor-parallel path)."""
    base_lr = lr * 100 if use_sgd else lr
    if scheduler == "cos":
        epoch_sched = cosine_annealing(base_lr, epochs)
    elif scheduler == "step":
        epoch_sched = step_lr(base_lr)
    elif scheduler == "none":
        epoch_sched = lambda e: base_lr  # noqa: E731
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")

    def sched(step):
        return epoch_sched(step // steps_per_epoch)

    if use_sgd:
        core = optax.trace(decay=momentum, nesterov=False)
    else:
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),  # torch L2-into-grad
        core,
        optax.scale_by_schedule(lambda s: -sched(s)),
    )
    return optax.flatten(tx) if flatten else tx


def init_train_state(
    key: jax.Array, cfg: DGCNNConfig, tx: optax.GradientTransformation
) -> TrainState:
    pkey, rkey = jax.random.split(key)
    params, bn_state = init_dgcnn(pkey, cfg)
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        rng=rkey,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    cfg: DGCNNConfig,
    tx: optax.GradientTransformation,
    *,
    smoothing: bool = True,
    donate: bool = True,
    device_masks: bool = False,
    exclude_classes: tuple[int, ...] = (),
    remat: "bool | str" = False,
    grad_accum: int = 1,
    band_guard: bool = False,
) -> Callable:
    """Build the jitted train step.

    The step takes ``(state, points (B,N,F), labels (B,N) int, mask (B,N))``
    and returns ``(new_state, metrics)`` where metrics holds the scalar loss
    and a (C, C) confusion matrix over masked points (accumulate matrices on
    host and derive accuracy / balanced accuracy / IoU at logging time).

    ``band_guard=True`` (the train loop passes ``cfg._guard_amortized``)
    adds a trailing ``band_mode`` int32-scalar argument (see
    ``apply_dgcnn``) and a ``metrics["band_tripped"]`` bool — the host
    side of the amortized feature-band recall guard
    (:class:`BandGuardScheduler`). The train loop already syncs per step
    on ``float(metrics["loss"])``, so reading the flag costs nothing.

    ``grad_accum > 1`` splits the leading batch axis into that many
    micro-batches, runs them through a ``lax.scan`` accumulating gradients
    (and BN running statistics sequentially, as torch would see the same
    micro-batches), and applies ONE optimizer update on the mean gradient.
    Program size stays that of the micro-batch — effective batches beyond
    the compiler's single-program ceiling (B=32+ on one v5e) train fine.
    Loss is the mean of per-micro-batch masked means (standard
    grad-accumulation semantics; differs from a global masked mean only
    when micro-batches carry different valid-point counts).

    ``device_masks=True`` ignores the passed mask (still multiplied in as a
    validity mask) and draws the class-balance mask in-graph
    (:func:`dgcnn_tpu.ops.masks.balanced_train_mask`) from the state PRNG —
    no host-side mask work per batch.

    ``remat`` rematerialises forward activations in the backward pass:

    * ``False`` — store everything (XLA default);
    * ``"selective"`` — keep only per-point residuals (the tensors tagged
      ``checkpoint_name(_, "pt")`` in models/dgcnn.py: stage outputs, kNN
      indices) and recompute the (B, N, k, C) k-expanded chains — they are
      the memory hogs AND the HBM-traffic hogs of the stock backward, while
      their recompute is one cheap gather + elementwise per stage. This is
      both the fast and the low-memory setting (enables B=32 on one v5e);
    * ``True`` — full remat (``nothing_saveable``), maximum memory savings.
    """
    from dgcnn_tpu.ops.masks import balanced_train_mask

    if isinstance(remat, str):  # accept the CLI strings programmatically
        try:
            remat = {"off": False, "full": True,
                     "selective": "selective"}[remat]
        except KeyError:
            raise ValueError(
                f"remat must be bool, 'off', 'selective' or 'full'; "
                f"got {remat!r}"
            ) from None

    def _fwd(params, bn_state, points, rng, band_mode=None):
        return apply_dgcnn(params, bn_state, points, cfg, train=True,
                           rng=rng, band_mode=band_mode,
                           with_band_flag=band_guard)

    if remat == "selective":
        fwd = jax.checkpoint(
            _fwd,
            policy=jax.checkpoint_policies.save_only_these_names("pt"),
        )
    elif remat:
        fwd = jax.checkpoint(
            _fwd, policy=jax.checkpoint_policies.nothing_saveable
        )
    else:
        fwd = _fwd

    def loss_fn(params, bn_state, points, labels, mask, rng,
                band_mode=None):
        out, new_bn = fwd(params, bn_state, points, rng, band_mode)
        logits, tripped = out if band_guard else (out, None)
        loss = masked_smoothed_cross_entropy(
            logits, labels, mask, smoothing=smoothing
        )
        return loss, (new_bn, logits, tripped)

    def step(state: TrainState, points, labels, mask, band_mode=None):
        rng, dropout_rng = jax.random.split(state.rng)
        if device_masks:
            rng, mask_rng = jax.random.split(rng)
            mask = mask * balanced_train_mask(
                mask_rng, labels, cfg.num_classes, exclude_classes
            )
        if grad_accum == 1:
            (loss, (new_bn, logits, tripped)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.bn_state, points, labels, mask,
              dropout_rng, band_mode)
            pred = jnp.argmax(logits, axis=-1)
            cm = confusion_matrix(pred, labels, cfg.num_classes,
                                  weights=mask)
        else:
            b = points.shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch {b} not divisible by grad_accum {grad_accum}"
                )
            micro = b // grad_accum

            def split_mb(t):
                return t.reshape((grad_accum, micro) + t.shape[1:])

            keys = jax.random.split(dropout_rng, grad_accum)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like,
                                                state.params)
            zero_cm = jnp.zeros((cfg.num_classes, cfg.num_classes),
                                jnp.float32)

            def body(carry, xs):
                bn, gacc, lacc, cmacc, tacc = carry
                pts_i, lbl_i, msk_i, key_i = xs
                (l_i, (bn, logits, t_i)), g_i = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, bn, pts_i, lbl_i, msk_i, key_i, band_mode)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, g_i)
                pred = jnp.argmax(logits, axis=-1)
                cmacc = cmacc + confusion_matrix(
                    pred, lbl_i, cfg.num_classes, weights=msk_i)
                if band_guard:
                    tacc = jnp.logical_or(tacc, t_i)
                return (bn, gacc, lacc + l_i, cmacc, tacc), None

            (new_bn, grads, loss, cm, tripped), _ = jax.lax.scan(
                body,
                (state.bn_state, zero_grads, jnp.float32(0.0), zero_cm,
                 jnp.zeros((), jnp.bool_)),
                (split_mb(points), split_mb(labels), split_mb(mask), keys),
            )
            inv = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "confusion": cm}
        if band_guard:
            metrics["band_tripped"] = tripped
        new_state = TrainState(
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


@functools.lru_cache(maxsize=32)
def make_eval_step(cfg: DGCNNConfig, *, smoothing: bool = True,
                   band_flag: bool = False) -> Callable:
    """Jitted eval step: running-stat BN, loss on logits, full-point
    confusion matrix (reference validation loop /root/reference/
    train.py:254-297, minus its double-softmax loss bug). ``mask`` weights
    both the loss and the confusion matrix so padded/duplicated points in
    pad-collated batches are not scored (None = all points valid).

    ``band_flag=True`` (internal — :func:`make_guarded_eval_step` wraps
    it) adds a trailing ``band_mode`` argument and a
    ``"band_tripped"`` output key (amortized recall guard)."""

    @jax.jit
    def step(params, bn_state, points, labels, mask=None, band_mode=None):
        out, _ = apply_dgcnn(params, bn_state, points, cfg, train=False,
                             band_mode=band_mode, with_band_flag=band_flag)
        logits, tripped = out if band_flag else (out, None)
        if mask is None:
            mask = jnp.ones(labels.shape, jnp.float32)
        loss = masked_smoothed_cross_entropy(
            logits, labels, mask, smoothing=smoothing,
        )
        pred = jnp.argmax(logits, axis=-1)
        cm = confusion_matrix(pred, labels, cfg.num_classes, weights=mask)
        res = {"loss": loss, "confusion": cm, "pred": pred,
               "logits": logits}
        if band_flag:
            res["band_tripped"] = tripped
        return res

    return step


def make_guarded_eval_step(
    cfg: DGCNNConfig, *, smoothing: bool = True,
) -> "tuple[Callable, BandGuardScheduler]":
    """``(step, scheduler)``: drop-in for :func:`make_eval_step` that runs
    the amortized sticky recall-guard protocol when
    ``cfg._guard_amortized`` (otherwise the plain memoised step and an
    inert scheduler). The wrapper keeps the plain call signature and
    output dict; ``band_mode`` plumbing and trip-flag observation happen
    inside. Call ``scheduler.rearm()`` to re-trust the band (e.g. at the
    start of each validation pass — the model's features changed)."""
    sched = BandGuardScheduler(cfg)
    if not sched.active:
        return make_eval_step(cfg, smoothing=smoothing), sched
    inner = make_eval_step(cfg, smoothing=smoothing, band_flag=True)

    def step(params, bn_state, points, labels, mask=None):
        mode, guarded = sched.next_mode()
        out = dict(inner(params, bn_state, points, labels, mask, mode))
        tripped = out.pop("band_tripped")
        if guarded:
            sched.observe(tripped)
        return out

    return step, sched


@functools.lru_cache(maxsize=32)
def make_predict_step(
    cfg: DGCNNConfig, *, min_class_confidence: float = 0.8,
    unclassified: int = 31, band_flag: bool = False,
) -> Callable:
    """Jitted inference step with the reference's confidence thresholding:
    points whose max softmax probability is below ``min_class_confidence``
    are labelled LAS class 31 UNCLASSIFIED (/root/reference/test.py:15,
    :122-127). Returns (pred, probs, logits) — raw logits are what the
    postprocess dump contract stores (combine_results.py:61-79 softmaxes
    columns 8: itself; dumping probs would double-softmax downstream).

    Memoised on the (hashable, frozen) config: repeated ``predict()`` /
    ``test()`` calls in one process — the serve loop classifies every
    tile through a fresh ``predict()`` — reuse ONE jit object, so warm
    calls skip re-tracing and executable-cache lookups (a few hundred ms
    to seconds per call at the production config's program size)."""

    @jax.jit
    def step(params, bn_state, points, band_mode=None):
        out, _ = apply_dgcnn(params, bn_state, points, cfg, train=False,
                             band_mode=band_mode, with_band_flag=band_flag)
        logits, tripped = out if band_flag else (out, None)
        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.max(probs, axis=-1)
        pred = jnp.argmax(probs, axis=-1)
        pred = jnp.where(conf < min_class_confidence, unclassified, pred)
        pred = pred.astype(jnp.int32)
        if band_flag:
            return pred, probs, logits, tripped
        return pred, probs, logits

    return step


def make_guarded_predict_step(
    cfg: DGCNNConfig, *, min_class_confidence: float = 0.8,
    unclassified: int = 31,
) -> "tuple[Callable, BandGuardScheduler]":
    """``(step, scheduler)``: drop-in for :func:`make_predict_step` that
    runs the amortized sticky recall-guard protocol when
    ``cfg._guard_amortized`` (otherwise the plain memoised step and an
    inert scheduler). The wrapper keeps the plain 3-tuple return and
    never syncs: trip flags are polled non-blocking, so the async
    dispatch window in eval/predict.py is preserved."""
    sched = BandGuardScheduler(cfg)
    if not sched.active:
        return make_predict_step(
            cfg, min_class_confidence=min_class_confidence,
            unclassified=unclassified), sched
    inner = make_predict_step(
        cfg, min_class_confidence=min_class_confidence,
        unclassified=unclassified, band_flag=True)

    def step(params, bn_state, points):
        mode, guarded = sched.next_mode()
        pred, probs, logits, tripped = inner(params, bn_state, points,
                                             mode)
        if guarded:
            sched.observe(tripped)
        return pred, probs, logits

    return step, sched
