"""Train-step tests: loss decreases, schedules match torch formulas,
state round-trips, data-parallel sharding over the 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.train.steps import (
    cosine_annealing,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_predict_step,
    make_train_step,
    step_lr,
)

CFG = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                  knn_query_chunk=None)


def _batch(key, b=4, n=48):
    kp, kl = jax.random.split(jax.random.key(key))
    pts = jax.random.normal(kp, (b, n, 3))
    # make labels learnable: class = quadrant of xy
    x = np.asarray(pts)
    labels = (x[..., 0] > 0).astype(np.int32) * 2 + (x[..., 1] > 0)
    return pts, jnp.asarray(labels), jnp.ones((b, n), jnp.float32)


def test_loss_decreases():
    tx = make_optimizer(lr=3e-3, scheduler="none")
    state = init_train_state(jax.random.key(0), CFG, tx)
    step = make_train_step(CFG, tx, donate=False)
    pts, labels, mask = _batch(1)
    losses = []
    for _ in range(30):
        state, m = step(state, pts, labels, mask)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses[::10]


def test_mask_zero_points_do_not_train():
    """Gradient contributions come only from masked points."""
    # weight_decay=0: torch-style L2 regularisation pulls params even with
    # zero data gradient, which would mask the thing under test
    tx = make_optimizer(lr=1e-2, scheduler="none", weight_decay=0.0)
    state = init_train_state(jax.random.key(0), CFG, tx)
    step = make_train_step(CFG, tx, donate=False)
    pts, labels, _ = _batch(2)
    zero_mask = jnp.zeros(labels.shape, jnp.float32)
    new_state, m = step(state, pts, labels, zero_mask)
    assert float(m["loss"]) == 0.0
    # Adam with zero grads yields zero updates -> params unchanged
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, new_state.params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0


def test_cosine_schedule_matches_torch_formula():
    sched = cosine_annealing(0.1, epochs=30, eta_min=1e-3)
    for t in (0, 1, 15, 30):
        want = 1e-3 + (0.1 - 1e-3) * (1 + np.cos(np.pi * t / 30)) / 2
        assert float(sched(t)) == pytest.approx(want, rel=1e-6)


def test_step_schedule_floor():
    sched = step_lr(1e-3, step_size=20, gamma=0.5, floor=1e-5)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(5e-4)
    assert float(sched(2000)) == pytest.approx(1e-5)  # floored


def test_eval_and_predict_steps():
    tx = make_optimizer()
    state = init_train_state(jax.random.key(0), CFG, tx)
    pts, labels, _ = _batch(3)
    ev = make_eval_step(CFG)(state.params, state.bn_state, pts, labels)
    assert ev["pred"].shape == labels.shape
    assert np.isfinite(float(ev["loss"]))
    pred, probs, logits = make_predict_step(CFG, min_class_confidence=0.999)(
        state.params, state.bn_state, pts
    )
    # an untrained model is rarely 99.9% confident -> mostly UNCLASSIFIED
    assert (np.asarray(pred) == 31).mean() > 0.5
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits, -1)), np.asarray(probs), atol=1e-6
    )
    # memoised on the frozen config: repeat predict()/test()/serve calls
    # must reuse ONE jit object (no per-call re-trace)
    assert make_predict_step(CFG, min_class_confidence=0.999) is (
        make_predict_step(CFG, min_class_confidence=0.999))
    assert make_predict_step(CFG, min_class_confidence=0.5) is not (
        make_predict_step(CFG, min_class_confidence=0.999))


def test_data_parallel_step_matches_single_device():
    """The jitted train step under a data-sharded batch on the 8-device CPU
    mesh must produce the same numbers as unsharded execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dgcnn_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # SGD: updates are linear in the gradients, so cross-device psum
    # reassociation stays at fp-noise level (Adam's g/sqrt(v) normalisation
    # would amplify ~1e-7 gradient noise to ~lr-sized update differences)
    tx = make_optimizer(use_sgd=True, lr=1e-5, scheduler="none")
    state = init_train_state(jax.random.key(0), CFG, tx)
    step = make_train_step(CFG, tx, donate=False)
    pts, labels, mask = _batch(4, b=8)

    ref_state, ref_m = step(state, pts, labels, mask)

    mesh = make_mesh(n_data=8)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    s_state = jax.device_put(state, repl)
    sp = jax.device_put(pts, shard)
    sl = jax.device_put(labels, shard)
    sm = jax.device_put(mask, shard)
    new_state, m = step(s_state, sp, sl, sm)

    assert float(m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(m["confusion"]), np.asarray(ref_m["confusion"]), atol=0.5
    )
    a = jax.tree_util.tree_leaves(ref_state.params)
    b = jax.tree_util.tree_leaves(new_state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _run_dryrun_subprocess(setup_code: str, n: int):
    """Run dryrun_multichip(n) in a child interpreter after `setup_code`,
    with NO helpful XLA_FLAGS/JAX_PLATFORMS in the env (the driver's world)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = f"{setup_code}\nimport __graft_entry__ as g; g.dryrun_multichip({n})"
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=420,
    )


def test_dryrun_bootstraps_uninitialized_process():
    """Driver scenario: fresh process, no XLA_FLAGS, backend uninitialized —
    dryrun must self-bootstrap an n-device virtual CPU backend in-process
    (MULTICHIP_r01 regression)."""
    r = _run_dryrun_subprocess("", 2)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(2): ok" in r.stdout


def test_dryrun_odd_device_count_skips_tp():
    """Odd n >= 3 puts the whole mesh on the points axis (n_sp = n), which
    cannot shard the 32/192-wide trunk channels — the TP section must be
    skipped with a note, not crash in shard_params_tp (round-3 regression)."""
    r = _run_dryrun_subprocess("", 3)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(3): ok" in r.stdout
    assert "TP train skipped" in r.stdout


def test_dryrun_reexecs_when_backend_pinned():
    """Process already initialized a 1-device backend: dryrun must detect the
    shortage and re-exec a virtual-CPU child rather than crash."""
    setup = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, 'setup expects a 1-device backend'\n"
    )
    r = _run_dryrun_subprocess(setup, 2)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(2): ok" in r.stdout


def test_graft_entry_compiles_tiny():
    """entry() itself is the 7000-point flagship (heavy on CPU); check the
    same code path at a tiny config instead."""
    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    cfg = DGCNNConfig(num_classes=5, num_features=4, k=5, emb_dims=32,
                      knn_query_chunk=16)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 40, 4))
    out = jax.jit(
        lambda p, s, x: apply_dgcnn(p, s, x, cfg, train=False)[0]
    )(params, state, x)
    assert out.shape == (2, 40, 5)


def test_remat_string_values():
    """make_train_step accepts the CLI strings; 'off' must mean NO remat
    (a truthy string must not silently enable full remat) and junk must
    raise."""
    from dgcnn_tpu.train.steps import make_train_step

    tx = make_optimizer()
    for val in ("off", "selective", "full", False, True):
        make_train_step(CFG, tx, remat=val)  # builds without error
    with pytest.raises(ValueError, match="remat"):
        make_train_step(CFG, tx, remat="sometimes")


def test_grad_accum_matches_plain_on_duplicated_batch():
    """grad_accum=2 over a batch of two IDENTICAL micro-batches must
    produce exactly the plain step's parameter update (train-mode BN
    normalizes with batch stats, so identical micro-batches yield
    identical per-micro gradients; their mean equals the single-micro
    gradient). Dropout off so the per-micro PRNG keys are unused."""
    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                      knn_query_chunk=None, dropout=0.0)
    tx = make_optimizer(lr=3e-3, scheduler="none")
    pts, labels, mask = _batch(5, b=2, n=48)
    dup = (jnp.concatenate([pts, pts]), jnp.concatenate([labels, labels]),
           jnp.concatenate([mask, mask]))

    s0 = init_train_state(jax.random.key(0), cfg, tx)
    plain = make_train_step(cfg, tx, donate=False)
    accum = make_train_step(cfg, tx, donate=False, grad_accum=2)

    s_plain, m_plain = plain(s0, pts, labels, mask)
    s_acc, m_acc = accum(s0, *dup)

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_plain["loss"]),
                               rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_acc.params),
                     jax.tree_util.tree_leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-5)
    # confusion matrix counts both copies
    np.testing.assert_allclose(np.asarray(m_acc["confusion"]),
                               2 * np.asarray(m_plain["confusion"]),
                               rtol=1e-6)


def test_grad_accum_requires_divisible_batch():
    tx = make_optimizer()
    step = make_train_step(CFG, tx, donate=False, grad_accum=3)
    pts, labels, mask = _batch(6, b=4, n=48)
    state = init_train_state(jax.random.key(0), CFG, tx)
    with pytest.raises(ValueError, match="divisible"):
        step(state, pts, labels, mask)


def test_grad_accum_composes_with_remat():
    """grad accumulation must compose with selective rematerialisation
    (the low-memory + large-effective-batch production combination)."""
    cfg = DGCNNConfig(num_classes=4, num_features=3, k=6, emb_dims=32,
                      knn_query_chunk=None, dropout=0.0)
    tx = make_optimizer(lr=3e-3, scheduler="none")
    step = make_train_step(cfg, tx, donate=False, grad_accum=2,
                           remat="selective")
    pts, labels, mask = _batch(7, b=4, n=48)
    state = init_train_state(jax.random.key(0), cfg, tx)
    state, metrics = step(state, pts, labels, mask)
    assert np.isfinite(float(metrics["loss"]))


def test_knn_train_unroll_auto_marker(tmp_path, monkeypatch):
    """knn_train_unroll='auto' resolves from the cache-warm marker: an
    explicit unrolled run seeds it after its first step; auto runs of the
    SAME config then pick the unrolled kernel, other configs do not."""
    import numpy as np

    from dgcnn_tpu.train.loop import train
    from dgcnn_tpu.utils import compilation_cache as cc
    from dgcnn_tpu.utils.logging import IOStream

    monkeypatch.setenv("DGCNN_JAX_CACHE_DIR", str(tmp_path / "jax"))
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(2):
        pts = rng.random((200, 4)) * 30
        labels = rng.integers(0, 5, (200, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    kwargs = dict(
        data_dir=str(data_dir), num_points=32, epochs=1, num_classes=5,
        num_features=4, train_batch_size=2, validation_batch_size=2,
        emb_dims=32, validation_prop=0.0, seed=1, knn_impl="xla",
        tb_dir=str(tmp_path / "tb"), data_parallel=False,
    )
    io = IOStream(str(tmp_path / "log.txt"))

    key = cc.warm_key("train-unroll", 2, 32, 5, 4, 32, 0.5, "xla", None,
                      None, 2, 1, False, True, False, (), False, 0.001,
                      0.9, "cos", 1, 1, 8, False, 1, False,
                      2048, 4096, False, 6, 64, 256, 0.995, 8)
    assert not cc.is_warm(key)
    train(2, io, model_root=str(tmp_path / "m1"),
          knn_train_unroll="1", **kwargs)
    assert cc.is_warm(key)           # explicit run seeded the marker
    # a DIFFERENT config (other k) stays cold
    other = cc.warm_key("train-unroll", 3, 32, 5, 4, 32, 0.5, "xla", None,
                        None, 2, 1, False, True, False, (), False, 0.001,
                        0.9, "cos", 1, 1, 8, False, 1, False,
                        2048, 4096, False, 6, 64, 256, 0.995, 8)
    assert not cc.is_warm(other)
    # graph-construction knobs are part of the key too: the share3
    # program (2 kNN calls vs 3) must not inherit the default's marker
    share3 = cc.warm_key("train-unroll", 2, 32, 5, 4, 32, 0.5, "xla", None,
                         None, 2, 1, False, True, False, (), False, 0.001,
                         0.9, "cos", 1, 1, 8, False, 1, False,
                         2048, 4096, True, 6, 64)
    assert not cc.is_warm(share3)
    # and the auto run trains fine (resolves the marker internally)
    train(2, io, model_root=str(tmp_path / "m2"),
          knn_train_unroll="auto", **kwargs)


def test_flattened_optimizer_matches_per_leaf():
    """make_optimizer(flatten=True) (an opt-in knob — the default stays
    flatten=False because True changes the opt_state checkpoint layout)
    must match the per-leaf chain: every transform is elementwise, so the
    concatenated-vector update is the same arithmetic per element (up to
    1-ulp XLA fusion differences). Two Adam steps; losses exactly equal,
    params to 1 ulp."""
    pts, labels, mask = _batch(3)
    trajs = []
    for flat in (True, False):
        tx = make_optimizer(lr=3e-3, scheduler="none", flatten=flat)
        state = init_train_state(jax.random.key(0), CFG, tx)
        step = make_train_step(CFG, tx, donate=False)
        for _ in range(2):
            state, m = step(state, pts, labels, mask)
        trajs.append((state.params, float(m["loss"])))
    assert trajs[0][1] == trajs[1][1]
    for a, b in zip(jax.tree_util.tree_leaves(trajs[0][0]),
                    jax.tree_util.tree_leaves(trajs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-7, atol=1e-9)
