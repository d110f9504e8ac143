"""Amortized feature-band recall guard (``DGCNNConfig.knn_band_guard_every``).

Round-4 measured the in-graph recall guard at ~0.3-0.8 ms per feature-banded
call (BASELINE.md round-5 r5b); the amortized protocol pays the probe kernels
on every Nth host dispatch only, with a STICKY host-side fallback to the full
capped kernel once a guarded dispatch measures recall below the threshold
(reference graph-quality contract: /root/reference/model.py:25-40).

Layers under test:
- kernel: ``knn_pallas_feature_banded(guard_ok=..., with_flag=True)`` —
  runtime probe gating + the tripped flag;
- model: ``apply_dgcnn(band_mode=..., with_band_flag=True)`` — mode 0/1/2
  parity against the unamortized graphs;
- host: ``BandGuardScheduler`` cadence/sticky/rearm protocol and the
  ``make_guarded_eval_step`` / ``make_guarded_predict_step`` wrappers;
- train: ``make_train_step(band_guard=True)`` flag plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.kernels.knn_pallas import (
    knn_pallas,
    knn_pallas_feature_banded,
)
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
from dgcnn_tpu.train.steps import (
    BandGuardScheduler,
    init_train_state,
    make_eval_step,
    make_guarded_eval_step,
    make_guarded_predict_step,
    make_optimizer,
    make_predict_step,
    make_train_step,
)

FB = dict(band=512, n_win=16, cap=8, query_tile=128, interpret=True)
T = jnp.asarray(True)
F = jnp.asarray(False)

# model-level config: N must exceed the feature band for banding to engage
# (n_pad=384 > band=256); knn_impl explicit so _guard_amortized is True on
# the CPU test backend
GCFG = dict(
    num_classes=5, num_features=4, k=8, emb_dims=64,
    knn_impl="pallas_capped", knn_band=0, knn_band_feature=256,
    knn_band_recall_guard=32, knn_band_guard_every=4,
    knn_query_chunk=None,
)
N_PTS = 384


def _decorrelated(rng, b, n, c):
    """Feature rows whose neighbourhoods are NOT row-local: uniform random,
    so a 512-band over 1536 rows holds ~1/3 of true neighbours — any probe
    measures recall far below the 0.995 threshold."""
    return jnp.asarray(rng.uniform(0, 30, (b, n, c)).astype(np.float32))


def _sorted_input(seed=0, b=2, n=N_PTS, f=4):
    x = np.asarray(jax.random.normal(jax.random.key(seed), (b, n, f)))
    order = np.argsort(x[..., 0], axis=1, kind="stable")
    return jnp.asarray(np.take_along_axis(x, order[..., None], axis=1))


# ---------------------------------------------------------------- kernel

def test_guard_ok_false_skips_probe_keeps_banded(rng):
    """guard_ok=False must skip the probe kernels and KEEP the (degraded)
    banded graph even on adversarial features — the whole point of the
    amortized mode is that unguarded dispatches trust the band."""
    f = _decorrelated(rng, 1, 1536, 8)
    banded_ref = np.asarray(knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=0, **FB))
    idx, tripped = knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=128, guard_ok=F, with_flag=True,
        **FB)
    np.testing.assert_array_equal(np.asarray(idx), banded_ref)
    assert not bool(tripped)


def test_guard_ok_true_trips_and_falls_back(rng):
    f = _decorrelated(rng, 1, 1536, 8)
    capped_ref = np.asarray(knn_pallas(f, 8, packed=True, cap=8,
                                       unroll_cap=0, interpret=True))
    idx, tripped = knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=128, guard_ok=T, with_flag=True,
        **FB)
    np.testing.assert_array_equal(np.asarray(idx), capped_ref)
    assert bool(tripped)


def test_with_flag_no_trip_on_local_features(rng):
    """Row-local features: a guarded call keeps the band and reports
    tripped=False; result bit-equal to the plain (flagless) call."""
    base = np.cumsum(rng.integers(0, 3, (1, 1600, 1)), axis=1)
    f = jnp.asarray((base + rng.integers(0, 4, (1, 1600, 6)))
                    .astype(np.float32))
    plain = np.asarray(knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=128, **FB))
    idx, tripped = knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=128, guard_ok=T, with_flag=True,
        **FB)
    np.testing.assert_array_equal(np.asarray(idx), plain)
    assert not bool(tripped)


def test_unsorted_fallback_is_not_a_trip(rng):
    """sorted_ok=False takes the capped kernel because banding never
    engaged — the flag must stay False (the host should not go sticky
    over input order; the kernel already handles it per dispatch)."""
    f = _decorrelated(rng, 1, 1536, 8)
    idx, tripped = knn_pallas_feature_banded(
        f, 8, sorted_ok=F, recall_guard=128, guard_ok=T, with_flag=True,
        **FB)
    capped_ref = np.asarray(knn_pallas(f, 8, packed=True, cap=8,
                                       unroll_cap=0, interpret=True))
    np.testing.assert_array_equal(np.asarray(idx), capped_ref)
    assert not bool(tripped)


def test_small_input_fallback_is_not_a_trip(rng):
    f = _decorrelated(rng, 1, 256, 8)  # n_pad <= band -> capped
    idx, tripped = knn_pallas_feature_banded(
        f, 8, sorted_ok=T, recall_guard=128, guard_ok=T, with_flag=True,
        **FB)
    assert not bool(tripped)
    assert idx.shape == (1, 256, 8)


# ------------------------------------------------------------- scheduler

def test_scheduler_cadence_and_sticky():
    cfg = DGCNNConfig(**GCFG)
    assert cfg._guard_amortized
    sched = BandGuardScheduler(cfg)
    assert sched.active
    modes = [sched.next_mode() for _ in range(8)]
    assert [int(m) for m, _ in modes] == [1, 0, 0, 0, 1, 0, 0, 0]
    assert [g for _, g in modes] == [True, False, False, False,
                                     True, False, False, False]
    # a trip flag observed -> every later dispatch forces the capped
    # kernel (mode 2) and is no longer "guarded"
    sched.observe(jnp.asarray(True))
    assert sched.tripped
    mode, guarded = sched.next_mode()
    assert int(mode) == 2 and not guarded
    # rearm re-trusts the band and restarts the cadence
    sched.rearm()
    assert not sched.tripped
    mode, guarded = sched.next_mode()
    assert int(mode) == 1 and guarded


def test_scheduler_false_flags_do_not_stick():
    sched = BandGuardScheduler(DGCNNConfig(**GCFG))
    sched.observe(jnp.asarray(False))
    sched.observe(jnp.asarray(False))
    assert not sched.tripped
    assert int(sched.next_mode()[0]) == 1


def test_scheduler_unknown_flag_types_never_silently_block():
    """Flag objects without .is_ready (future array types) must stay
    PENDING on non-blocking polls — a bool() there would collapse the
    async dispatch window. The _MAX_PENDING cap drains the oldest
    (blocking, but on a long-computed flag) and .tripped drains all."""

    class FakeFlag:
        def __init__(self, val):
            self.val = val
            self.evaluated = False

        def __bool__(self):
            self.evaluated = True
            return self.val

    sched = BandGuardScheduler(DGCNNConfig(**GCFG))
    flags = [FakeFlag(False) for _ in range(sched._MAX_PENDING)]
    for f in flags:
        sched.observe(f)
    sched.next_mode()  # non-blocking poll
    assert not any(f.evaluated for f in flags)  # nothing synced
    assert len(sched._pending) == sched._MAX_PENDING
    # one more observation drains the oldest (and only the oldest)
    sched.observe(FakeFlag(True))
    assert flags[0].evaluated and not flags[1].evaluated
    # the blocking property consumes everything, finds the True flag
    assert sched.tripped
    assert not sched._pending


def test_scheduler_mode_constants_cached():
    sched = BandGuardScheduler(DGCNNConfig(**GCFG))
    m_a, _ = sched.next_mode()
    for _ in range(3):
        sched.next_mode()
    m_b, _ = sched.next_mode()
    assert m_a is m_b  # same cached device constant, no per-step upload


def test_suspect_dispatches_window():
    """The retroactive-repair window: a trip at guarded dispatch G makes
    every mode-0 dispatch after the last CLEAN guard suspect; dispatches
    before it (bracketed by clean guards) and post-trip mode-2
    dispatches are not."""
    sched = BandGuardScheduler(DGCNNConfig(**GCFG))  # every=4
    # dispatch 0: guarded, observed clean
    assert sched.next_mode()[1]
    sched.observe(jnp.asarray(False))
    # dispatches 1-3: mode 0
    for _ in range(3):
        mode, guarded = sched.next_mode()
        assert int(mode) == 0 and not guarded
    # dispatch 4: guarded, observed TRIPPED
    assert sched.next_mode()[1]
    sched.observe(jnp.asarray(True))
    # dispatches 5-6: sticky mode 2
    for _ in range(2):
        assert int(sched.next_mode()[0]) == 2
    assert sched.suspect_dispatches() == [1, 2, 3]
    # rearm clears the window bookkeeping
    sched.rearm()
    assert sched.suspect_dispatches() == []


def test_suspect_dispatches_first_guard_trips():
    """No clean guard ever observed: every mode-0 dispatch issued while
    the first flag was in flight is suspect."""
    sched = BandGuardScheduler(DGCNNConfig(**GCFG))
    sched.next_mode()  # 0: guarded
    flag = jnp.asarray(True)
    for _ in range(3):  # 1-3 dispatched before the flag is observed
        sched.next_mode()
    sched.observe(flag)
    assert sched.suspect_dispatches() == [1, 2, 3]


def test_suspect_dispatches_empty_when_healthy():
    sched = BandGuardScheduler(DGCNNConfig(**GCFG))
    for _ in range(9):
        _, guarded = sched.next_mode()
        if guarded:
            sched.observe(jnp.asarray(False))
    assert sched.suspect_dispatches() == []


def test_scheduler_inert_when_not_amortized():
    cfg = DGCNNConfig(**{**GCFG, "knn_band_guard_every": 1})
    assert not cfg._guard_amortized
    sched = BandGuardScheduler(cfg)
    assert not sched.active


def test_guard_every_validation_and_property():
    with pytest.raises(ValueError, match="knn_band_guard_every"):
        DGCNNConfig(**{**GCFG, "knn_band_guard_every": 0})
    with pytest.raises(ValueError, match="knn_band_guard_every"):
        DGCNNConfig(**{**GCFG, "knn_band_guard_every": True})
    # any leg of the amortized path off -> property False
    assert not DGCNNConfig(
        **{**GCFG, "knn_band_feature": 0})._guard_amortized
    assert not DGCNNConfig(
        **{**GCFG, "knn_band_recall_guard": 0})._guard_amortized
    assert not DGCNNConfig(
        **{**GCFG, "knn_impl": "xla"})._guard_amortized


# ----------------------------------------------------------------- model

@pytest.fixture(scope="module")
def guarded_model():
    cfg = DGCNNConfig(**GCFG)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    return cfg, params, state, _sorted_input()


def test_band_mode0_matches_unguarded_banded(guarded_model):
    """Mode 0 (probes skipped) must be bit-identical to the same config
    with the guard disabled — the probe only ever costs time."""
    cfg, params, state, x = guarded_model
    cfg_noguard = DGCNNConfig(**{**GCFG, "knn_band_recall_guard": 0,
                                 "knn_band_guard_every": 1})
    ref, _ = apply_dgcnn(params, state, x, cfg_noguard, train=False)
    (got, tripped), _ = apply_dgcnn(
        params, state, x, cfg, train=False,
        band_mode=jnp.asarray(0, jnp.int32), with_band_flag=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert not bool(tripped)


def test_band_mode1_matches_always_guarded(guarded_model):
    """Mode 1 (probes run) must be bit-identical to band_mode=None (the
    round-4 guard-every-call graph), trip or no trip."""
    cfg, params, state, x = guarded_model
    ref, _ = apply_dgcnn(params, state, x, cfg, train=False)
    (got, _), _ = apply_dgcnn(
        params, state, x, cfg, train=False,
        band_mode=jnp.asarray(1, jnp.int32), with_band_flag=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_band_mode2_matches_capped(guarded_model):
    """Mode 2 (host sticky fallback) must produce the full-capped-kernel
    graph — identical to a config with feature banding off."""
    cfg, params, state, x = guarded_model
    cfg_capped = DGCNNConfig(**{**GCFG, "knn_band_feature": 0,
                                "knn_band_guard_every": 1})
    ref, _ = apply_dgcnn(params, state, x, cfg_capped, train=False)
    (got, tripped), _ = apply_dgcnn(
        params, state, x, cfg, train=False,
        band_mode=jnp.asarray(2, jnp.int32), with_band_flag=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert not bool(tripped)


def test_with_band_flag_rejects_taps(guarded_model):
    cfg, params, state, x = guarded_model
    with pytest.raises(ValueError, match="with_band_flag"):
        apply_dgcnn(params, state, x, cfg, train=False,
                    with_band_flag=True, depth=3)
    with pytest.raises(ValueError, match="with_band_flag"):
        apply_dgcnn(params, state, x, cfg, train=False,
                    with_band_flag=True, with_logits=True)


# ------------------------------------------------------- step wrappers

def test_guarded_eval_step_protocol(guarded_model):
    cfg, params, state, x = guarded_model
    labels = jnp.zeros(x.shape[:2], jnp.int32)
    step, sched = make_guarded_eval_step(cfg)
    assert sched.active
    out0 = step(params, state, x, labels)
    assert "band_tripped" not in out0  # wrapper keeps the plain dict
    # reference graphs for both possible post-call-0 states
    (banded, _), _ = apply_dgcnn(
        params, state, x, cfg, train=False,
        band_mode=jnp.asarray(0, jnp.int32), with_band_flag=True)
    (capped, _), _ = apply_dgcnn(
        params, state, x, cfg, train=False,
        band_mode=jnp.asarray(2, jnp.int32), with_band_flag=True)
    ref_logits = capped if sched.tripped else banded  # blocks on the flag
    out1 = step(params, state, x, labels)
    np.testing.assert_array_equal(np.asarray(out1["logits"]),
                                  np.asarray(ref_logits))
    # forcing a trip makes every later call use the capped graph
    sched.observe(jnp.asarray(True))
    out2 = step(params, state, x, labels)
    np.testing.assert_array_equal(np.asarray(out2["logits"]),
                                  np.asarray(capped))
    # rearm re-trusts the band: the next call is guarded (mode 1) and
    # must match the always-guarded graph
    sched.rearm()
    ref_guarded = make_eval_step(cfg)(params, state, x, labels)
    out3 = step(params, state, x, labels)
    np.testing.assert_array_equal(np.asarray(out3["logits"]),
                                  np.asarray(ref_guarded["logits"]))


def test_guarded_eval_step_inert_without_amortization(guarded_model):
    cfg, params, state, x = guarded_model
    cfg1 = DGCNNConfig(**{**GCFG, "knn_band_guard_every": 1})
    labels = jnp.zeros(x.shape[:2], jnp.int32)
    step, sched = make_guarded_eval_step(cfg1)
    assert not sched.active
    ref = make_eval_step(cfg1)(params, state, x, labels)
    out = step(params, state, x, labels)
    np.testing.assert_array_equal(np.asarray(out["logits"]),
                                  np.asarray(ref["logits"]))


def test_guarded_predict_step_protocol(guarded_model):
    cfg, params, state, x = guarded_model
    step, sched = make_guarded_predict_step(cfg)
    assert sched.active
    pred0, probs0, logits0 = step(params, state, x)  # guarded call
    assert pred0.shape == x.shape[:2]
    sched.observe(jnp.asarray(True))
    pred2, _, logits2 = step(params, state, x)
    ref = make_predict_step(
        cfg, band_flag=True)(params, state, x,
                             jnp.asarray(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(logits2),
                                  np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(pred2), np.asarray(ref[0]))


def test_train_step_band_guard_flag(guarded_model):
    cfg, params, state, x = guarded_model
    tx = make_optimizer(lr=1e-3, scheduler="none")
    ts = init_train_state(jax.random.key(0), cfg, tx)
    labels = jnp.zeros(x.shape[:2], jnp.int32)
    mask = jnp.ones(x.shape[:2], jnp.float32)
    step_g = make_train_step(cfg, tx, band_guard=True, donate=False)
    ts1, metrics = step_g(ts, x, labels, mask, jnp.asarray(1, jnp.int32))
    assert "band_tripped" in metrics
    assert np.isfinite(float(metrics["loss"]))
    # mode 1 (guarded) is graph-identical to the band_guard=False step
    # (whose band_mode=None guards every call)
    step_p = make_train_step(cfg, tx, band_guard=False, donate=False)
    _, metrics_p = step_p(ts, x, labels, mask)
    assert float(metrics["loss"]) == float(metrics_p["loss"])
    # mode 0 skips probes; on an untrained model the band may differ from
    # the guarded graph only via the in-graph fallback, so just assert it
    # runs and reports no trip
    _, metrics0 = step_g(ts, x, labels, mask, jnp.asarray(0, jnp.int32))
    assert not bool(metrics0["band_tripped"])


def test_train_step_band_guard_composes_with_accum_and_remat():
    """band_mode/flag plumbing must survive the grad-accum lax.scan carry
    and the jax.checkpoint wrapper. Small config (banding falls back to
    capped below the band size — the plumbing is what's under test)."""
    cfg = DGCNNConfig(**{**GCFG, "emb_dims": 32})
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = _sorted_input(b=2, n=64)
    labels = jnp.zeros(x.shape[:2], jnp.int32)
    mask = jnp.ones(x.shape[:2], jnp.float32)
    tx = make_optimizer(lr=1e-3, scheduler="none")
    for kwargs in ({"grad_accum": 2}, {"remat": "selective"},
                   {"remat": True, "grad_accum": 2}):
        ts = init_train_state(jax.random.key(0), cfg, tx)
        step = make_train_step(cfg, tx, band_guard=True, donate=False,
                               **kwargs)
        _, metrics = step(ts, x, labels, mask, jnp.asarray(1, jnp.int32))
        assert np.isfinite(float(metrics["loss"])), kwargs
        assert not bool(metrics["band_tripped"]), kwargs


def test_predict_retroactive_repair_plumbing(tmp_path, monkeypatch):
    """predict()'s repair pass re-assembles suspect batches bit-exactly:
    with a forced suspect list (banding inert at this size, so mode-2
    re-runs are bit-identical to the originals) the repaired output must
    equal the untouched run, proving the re-dispatch hits the same rows
    with the same batch assembly."""
    import importlib

    # the package re-exports the predict FUNCTION under the same name,
    # which shadows the submodule on attribute-style imports
    P = importlib.import_module("dgcnn_tpu.eval.predict")
    from dgcnn_tpu.io.las import write_las
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer
    from dgcnn_tpu.utils.logging import IOStream

    rng = np.random.default_rng(0)
    n = 6000  # >=1000 pts per 20 m block (the reference rejection rule)
    xy = rng.random((n, 2)) * 35
    z = 0.05 * xy[:, 0] + rng.normal(0, 0.1, n)
    las = tmp_path / "tile.las"
    write_las(str(las), xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, np.full(n, 2))

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=32,
                      knn_impl="pallas_capped", knn_band=0,
                      knn_band_feature=256, knn_band_recall_guard=16,
                      knn_band_guard_every=4)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state)
    io = IOStream(str(tmp_path / "log.txt"))
    kwargs = dict(
        num_points=64, num_classes=3, num_features=4, emb_dims=32,
        model_label="m", model_root=str(tmp_path),
        knn_impl="pallas_capped", knn_band=0, knn_band_feature=256,
        knn_band_recall_guard=16, knn_band_guard_every=4,
        min_class_confidence=0.0, batch_size=2, block_size=20.0,
    )
    _, pred_ref = P.predict(6, io, str(las), str(tmp_path / "a.las"),
                            **kwargs)

    forced: dict = {}

    def fake_suspects(self):
        # claim batches 0 and 1 are suspect exactly once (the repair run)
        if forced.pop("arm", None):
            return [0, 1]
        return []

    monkeypatch.setattr(BandGuardScheduler, "suspect_dispatches",
                        fake_suspects)
    forced["arm"] = True
    _, pred_fix = P.predict(6, io, str(las), str(tmp_path / "b.las"),
                            **kwargs)
    assert not forced  # the repair pass consumed the forced list
    np.testing.assert_array_equal(pred_fix, pred_ref)


def test_cli_flag_parses():
    from main import build_parser

    args = build_parser().parse_args(["--knn_band_guard_every", "4"])
    assert args.knn_band_guard_every == 4


def test_eval_retroactive_repair_plumbing(tmp_path, monkeypatch):
    """test()'s repair pass re-scores suspect batches and REPLACES their
    metric contributions exactly: with a forced suspect list (banding
    inert at this size, so mode-2 re-runs are bit-identical) the repaired
    metrics and per-room dump files must equal the untouched run, proving
    the deterministic batch re-enumeration hits the same rows."""
    from dgcnn_tpu.eval.test import test as run_test
    from dgcnn_tpu.train.checkpoint import save_checkpoint
    from dgcnn_tpu.train.steps import init_train_state, make_optimizer
    from dgcnn_tpu.utils.logging import IOStream

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(2):
        pts = rng.random((200, 4)) * 30
        labels = rng.integers(0, 3, (200, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    cfg = DGCNNConfig(num_classes=3, num_features=4, k=6, emb_dims=32,
                      knn_impl="pallas_capped", knn_band=0,
                      knn_band_feature=256, knn_band_recall_guard=16,
                      knn_band_guard_every=4)
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), cfg, tx)
    save_checkpoint(str(tmp_path / "m.npz"), state)
    io = IOStream(str(tmp_path / "log.txt"))
    kwargs = dict(
        data_dir=str(data_dir), num_points=32, num_classes=3,
        num_features=4, emb_dims=32, test_batch_size=2, model_label="m",
        model_root=str(tmp_path), knn_impl="pallas_capped", knn_band=0,
        knn_band_feature=256, knn_band_recall_guard=16,
        knn_band_guard_every=4, min_class_confidence=0.0,
        validation_prop=0.5, seed=1, dump_logits=True,
    )
    ref = run_test(6, io, pred_dir=str(tmp_path / "pa"), **kwargs)
    assert ref["band_repaired"] == 0

    forced: dict = {"arm": True}

    def fake_suspects(self):
        if forced.pop("arm", None):
            return [0, 1]
        return []

    monkeypatch.setattr(BandGuardScheduler, "suspect_dispatches",
                        fake_suspects)
    fix = run_test(6, io, pred_dir=str(tmp_path / "pb"), **kwargs)
    assert not forced  # the repair pass consumed the forced list
    assert fix["band_repaired"] == 2
    assert fix["accuracy"] == ref["accuracy"]
    assert fix["balanced_accuracy"] == ref["balanced_accuracy"]
    np.testing.assert_array_equal(fix["confusion"], ref["confusion"])
    np.testing.assert_array_equal(np.asarray(fix["iou"], float),
                                  np.asarray(ref["iou"], float))
    for f in sorted(p.name for p in (tmp_path / "pa").iterdir()):
        a = np.loadtxt(tmp_path / "pa" / f)
        b = np.loadtxt(tmp_path / "pb" / f)
        np.testing.assert_array_equal(b, a)
