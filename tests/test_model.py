"""DGCNN model tests: shapes, depth taps, parameter count, BN state updates,
train/eval determinism (reference: /root/reference/model.py:85-193)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.models.dgcnn import (
    DGCNN,
    DGCNNConfig,
    apply_dgcnn,
    count_parameters,
    init_dgcnn,
)

CFG = DGCNNConfig(num_classes=5, num_features=4, k=8, emb_dims=64,
                  knn_query_chunk=None)


@pytest.fixture(scope="module")
def model_and_input():
    params, state = init_dgcnn(jax.random.key(0), CFG)
    x = jax.random.normal(jax.random.key(1), (2, 64, 4))
    return params, state, x


def test_forward_shape(model_and_input):
    params, state, x = model_and_input
    logits, new_state = apply_dgcnn(params, state, x, CFG)
    assert logits.shape == (2, 64, 5)
    assert np.all(np.isfinite(np.asarray(logits)))
    # eval mode must not touch BN state
    for bn in state:
        np.testing.assert_array_equal(
            np.asarray(state[bn]["mean"]), np.asarray(new_state[bn]["mean"])
        )


def test_depth_taps(model_and_input):
    params, state, x = model_and_input
    shapes = {
        1: (2, 64, 64), 2: (2, 64, 64), 3: (2, 64, 64),
        4: (2, 64, 192), 5: (2, 64, CFG.emb_dims), 6: (2, CFG.emb_dims),
        7: (2, 64, CFG.emb_dims + 192), 8: (2, 64, 512), 9: (2, 64, 256),
        10: (2, 64, 5),
    }
    for depth, shape in shapes.items():
        out, _ = apply_dgcnn(params, state, x, CFG, depth=depth)
        assert out.shape == shape, f"depth {depth}"


def test_param_count_baseline_config():
    # ≈0.98 M params at F=4, C=5, emb=1024 (SURVEY.md §6 / model.py:116-141)
    cfg = DGCNNConfig(num_classes=5, num_features=4, k=30, emb_dims=1024)
    params, _ = init_dgcnn(jax.random.key(0), cfg)
    total, table = count_parameters(params)
    assert 960_000 < total < 1_000_000
    assert "Total Trainable Params" in table


def test_train_mode_updates_bn_state(model_and_input):
    params, state, x = model_and_input
    logits, new_state = apply_dgcnn(
        params, state, x, CFG, train=True, rng=jax.random.key(2)
    )
    assert logits.shape == (2, 64, 5)
    changed = any(
        not np.allclose(
            np.asarray(state[bn]["mean"]), np.asarray(new_state[bn]["mean"])
        )
        for bn in state
    )
    assert changed


def test_train_eval_bn_consistency(model_and_input):
    """After one train step on a fixed batch, running stats move toward the
    batch stats with momentum 0.1 (torch semantics)."""
    params, state, x = model_and_input
    _, new_state = apply_dgcnn(
        params, state, x, CFG, train=True, rng=jax.random.key(3)
    )
    m0 = np.asarray(state["bn1"]["mean"])
    m1 = np.asarray(new_state["bn1"]["mean"])
    # mean update must be a (1-0.1)/0.1 blend: new = 0.9*old + 0.1*batch
    batch = (m1 - 0.9 * m0) / 0.1
    assert np.all(np.isfinite(batch))
    # plugging the recovered batch mean back reproduces the update exactly
    np.testing.assert_allclose(0.9 * m0 + 0.1 * batch, m1, rtol=1e-6)


def test_eval_deterministic(model_and_input):
    params, state, x = model_and_input
    a, _ = apply_dgcnn(params, state, x, CFG)
    b, _ = apply_dgcnn(params, state, x, CFG)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage3_extrema_trick_matches_materialised(model_and_input):
    """Eval-mode stage-3 fold (max through BN+LReLU) must equal the direct
    computation even with negative BN gammas."""
    params, state, x = model_and_input
    # force some negative gammas in bn5 to exercise the min-selection path
    params = jax.tree_util.tree_map(lambda v: v, params)
    g = np.asarray(params["bn5"]["gamma"]).copy()
    g[::2] *= -1.0
    params["bn5"] = dict(params["bn5"], gamma=jnp.asarray(g))

    out_fast, _ = apply_dgcnn(params, state, x, CFG, depth=3)

    # direct path: run in train=False but via the train-mode materialised
    # formula with running stats — emulate by calling the internal pieces
    from dgcnn_tpu.models.dgcnn import _batch_norm, _lrelu
    from dgcnn_tpu.ops.edgeconv import edge_conv_linear
    from dgcnn_tpu.ops.knn import knn

    x1, _ = apply_dgcnn(params, state, x, CFG, depth=1)
    x2, _ = apply_dgcnn(params, state, x, CFG, depth=2)
    idx = knn(x2, CFG.k, query_chunk=None)
    e = edge_conv_linear(x2, idx, params["conv5"]["w"])
    e, _ = _batch_norm(e, params["bn5"], state["bn5"], train=False)
    want = jnp.max(_lrelu(e), axis=2)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_wrapper_class():
    model = DGCNN(num_classes=3, num_features=4, k=5, emb_dims=32,
                  knn_query_chunk=None)
    params, state = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 4))
    logits, _ = model.apply(params, state, x)
    assert logits.shape == (1, 32, 3)


def test_jit_forward(model_and_input):
    params, state, x = model_and_input
    fwd = jax.jit(lambda p, s, x: apply_dgcnn(p, s, x, CFG)[0])
    logits = fwd(params, state, x)
    ref, _ = apply_dgcnn(params, state, x, CFG)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_with_logits_single_pass_taps(model_and_input):
    """with_logits=True returns (logits, tap) from ONE forward, equal to the
    standalone depth tap and the full forward (viz uses this to avoid
    running the model twice per block)."""
    params, state, x = model_and_input
    full, _ = apply_dgcnn(params, state, x, CFG)
    for depth in list(range(1, 11)):
        (logits, tap), _ = apply_dgcnn(
            params, state, x, CFG, depth=depth, with_logits=True
        )
        want, _ = apply_dgcnn(params, state, x, CFG, depth=depth)
        np.testing.assert_array_equal(np.asarray(tap), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(logits), np.asarray(full))


def test_matmul_precision_knob(model_and_input):
    """matmul_precision='highest' runs and stays numerically close to the
    default (identical on CPU where f32 is already full precision)."""
    import dataclasses

    params, state, x = model_and_input
    cfg_h = dataclasses.replace(CFG, matmul_precision="highest")
    got, _ = apply_dgcnn(params, state, x, cfg_h)
    want, _ = apply_dgcnn(params, state, x, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_bad_depth_rejected(model_and_input):
    params, state, x = model_and_input
    with pytest.raises(ValueError, match="depth"):
        apply_dgcnn(params, state, x, CFG, depth=0, with_logits=True)
    with pytest.raises(ValueError, match="depth"):
        apply_dgcnn(params, state, x, CFG, depth=11)


def test_bn_stats_one_pass_matches_two_pass(model_and_input):
    """bn_stats="one_pass" (default, E[x^2]-E[x]^2 fused reduction) must
    agree with the literal torch two-pass order to float-noise levels in
    both the training forward and the updated running statistics."""
    params, state, x = model_and_input
    import dataclasses

    cfg2 = dataclasses.replace(CFG, bn_stats="two_pass")
    rng = jax.random.key(7)
    l1, s1 = apply_dgcnn(params, state, x, CFG, train=True, rng=rng)
    l2, s2 = apply_dgcnn(params, state, x, cfg2, train=True, rng=rng)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=0, atol=5e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_bn_one_pass_var_nonnegative():
    """Constant channels: E[x^2]-E[x]^2 can go slightly negative in floats;
    the clamp must keep rsqrt(var+eps) finite."""
    from dgcnn_tpu.models.dgcnn import _batch_norm

    x = jnp.full((4, 16, 3), 1234.567, jnp.float32)
    p = {"gamma": jnp.ones(3), "beta": jnp.zeros(3)}
    s = {"mean": jnp.zeros(3), "var": jnp.ones(3)}
    y, new_s = _batch_norm(x, p, s, train=True, one_pass=True)
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.asarray(new_s["var"]) >= 0)


def test_config_rejects_typo_strings():
    """Free-form config strings must error at construction, not silently
    select the other behaviour at use sites."""
    import pytest

    from dgcnn_tpu.models.dgcnn import DGCNNConfig

    with pytest.raises(ValueError):
        DGCNNConfig(bn_stats="one-pass")
    with pytest.raises(ValueError):
        DGCNNConfig(dropout_rng_impl="RBG")
    with pytest.raises(ValueError):
        DGCNNConfig(knn_impl="pallas_caped")
    with pytest.raises(ValueError):
        DGCNNConfig(matmul_precision="exact")
    DGCNNConfig(bn_stats="two_pass", dropout_rng_impl="threefry",
                knn_impl="pallas_capped", matmul_precision="highest")


def test_fused_epilogue_full_forward_parity():
    """fuse_epilogue=True (in-kernel-gather Pallas stages, interpret mode
    on CPU) must match the plain XLA eval forward — including a stage-3
    negative-gamma channel (the max/min select) and non-identity running
    BN statistics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    base = dict(num_classes=5, num_features=4, k=6, emb_dims=32,
                knn_query_chunk=None)
    cfg_r = DGCNNConfig(fuse_epilogue=False, **base)
    cfg_f = DGCNNConfig(fuse_epilogue=True, **base)
    params, state = init_dgcnn(jax.random.key(0), cfg_r)
    # negative gamma on some stage-3 channels + non-trivial running stats
    params["bn5"]["gamma"] = params["bn5"]["gamma"].at[::3].set(-0.7)
    rng = np.random.default_rng(1)
    for bn in state:
        state[bn] = {
            "mean": jnp.asarray(
                rng.normal(0, 0.2, state[bn]["mean"].shape), jnp.float32),
            "var": jnp.asarray(
                rng.random(state[bn]["var"].shape) + 0.5, jnp.float32),
        }
    x = jnp.asarray(rng.normal(size=(2, 50, 4)).astype(np.float32))
    want, _ = apply_dgcnn(params, state, x, cfg_r, train=False)
    got, _ = apply_dgcnn(params, state, x, cfg_f, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fuse_epilogue_auto_resolution():
    from dgcnn_tpu.models.dgcnn import DGCNNConfig

    import pytest

    # off-TPU auto resolves False; explicit True always wins
    assert DGCNNConfig(fuse_epilogue="auto")._fuse_on is False
    assert DGCNNConfig(fuse_epilogue=True)._fuse_on is True
    assert DGCNNConfig(fuse_epilogue=False)._fuse_on is False
    with pytest.raises(ValueError):
        DGCNNConfig(fuse_epilogue="on")


def test_dropout_bit_mask_statistics():
    """The bit-unpacked Bernoulli(0.5) dropout path: ~half the activations
    survive (scaled 2x), zeros elsewhere, deterministic per key, and the
    bit position mapping covers all channels independently."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn

    cfg = DGCNNConfig(num_classes=4, num_features=3, k=5, emb_dims=32,
                      dropout=0.5, dropout_rng_impl="threefry",
                      knn_query_chunk=None)
    params, state = init_dgcnn(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 3))

    out1, _ = apply_dgcnn(params, state, x, cfg, train=True,
                          rng=jax.random.key(7))
    out2, _ = apply_dgcnn(params, state, x, cfg, train=True,
                          rng=jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3, _ = apply_dgcnn(params, state, x, cfg, train=True,
                          rng=jax.random.key(8))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))

    # the conv8 output is 256-wide -> bit path taken; verify survival rate
    # on the pre-logits tap (depth 9 is pre-dropout; use direct mask check)
    bits = jax.random.bits(jax.random.key(7), (2, 64, 8), jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    mask = np.asarray(((bits[..., None] >> shifts) & 1)).reshape(2, 64, 256)
    rate = mask.mean()
    assert abs(rate - 0.5) < 0.02, rate
    # per-channel rates are individually near 1/2 (no stuck bit lanes)
    per_c = mask.reshape(-1, 256).mean(0)
    assert per_c.min() > 0.33 and per_c.max() < 0.67


def test_fused_eval_vmem_gate(rng):
    """DGCNN_FUSE_VMEM_MB=0 must route eval to the XLA chain (graceful
    large-N degradation) with identical output to the fused kernels."""
    import os

    import jax
    import numpy as np

    from dgcnn_tpu.models.dgcnn import (
        DGCNNConfig, apply_dgcnn, init_dgcnn, _vmem_table_ok,
    )

    assert _vmem_table_ok(7000, 64)
    assert not _vmem_table_ok(300_000, 64)  # 48 MiB default budget

    base = dict(num_classes=3, num_features=3, k=5, emb_dims=32,
                dropout=0.0, fuse_epilogue=True)
    x = jnp.asarray(rng.normal(size=(2, 40, 3)).astype("float32"))
    outs = {}
    for i, mb in enumerate(("", "0")):
        if mb:
            os.environ["DGCNN_FUSE_VMEM_MB"] = mb
        else:
            os.environ.pop("DGCNN_FUSE_VMEM_MB", None)
        try:
            cfg = DGCNNConfig(knn_query_chunk=1024 + i, **base)
            params, state = init_dgcnn(jax.random.key(0), cfg)
            logits, _ = apply_dgcnn(params, state, x, cfg, train=False)
            outs[mb] = np.asarray(logits)
        finally:
            os.environ.pop("DGCNN_FUSE_VMEM_MB", None)
    np.testing.assert_array_equal(outs[""], outs["0"])


def test_knn_share_stage3(model_and_input):
    """Opt-in shared-graph stage 3 (cfg.knn_share_stage3): stage 3 reuses
    stage 2's x1-space neighbour indices instead of re-kNN'ing on x2. The
    knob-on forward must equal a hand-wired forward that feeds stage 2's
    graph into stage 3, differ from the default (the graphs genuinely
    differ on generic inputs), and issue exactly 2 kNN calls (vs 3)."""
    import dataclasses as dc

    from dgcnn_tpu.models import dgcnn as M

    params, state, x = model_and_input
    cfg_on = dc.replace(CFG, knn_share_stage3=True)

    calls = []
    real_knn = M._knn

    def spy(xf, cfg, **kw):
        calls.append(xf.shape)
        return real_knn(xf, cfg, **kw)

    M._knn = spy
    try:
        out_off, _ = apply_dgcnn(params, state, x, CFG, depth=3)
        n_off = len(calls)
        calls.clear()
        out_on, _ = apply_dgcnn(params, state, x, cfg_on, depth=3)
        n_on = len(calls)
    finally:
        M._knn = real_knn
    assert (n_off, n_on) == (3, 2)
    assert not np.allclose(np.asarray(out_off), np.asarray(out_on))

    # hand-wired expectation: stage 3 on stage 2's indices
    x1, _ = apply_dgcnn(params, state, x, CFG, depth=1)
    x2, _ = apply_dgcnn(params, state, x, CFG, depth=2)
    idx2 = M._knn(x1, CFG, train=False, spatial=False)
    want, _ = M._edge_stage_single_conv(
        x2, CFG, params, state, train=False, idx=idx2)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # full forward + train mode run under the knob (gradients flow)
    logits, _ = apply_dgcnn(params, state, x, cfg_on)
    assert np.all(np.isfinite(np.asarray(logits)))
    g = jax.grad(
        lambda p: apply_dgcnn(p, state, x, cfg_on, train=True,
                              rng=jax.random.key(2))[0].sum()
    )(params)
    assert np.all(np.isfinite(np.asarray(g["conv5"]["w"])))

    with pytest.raises(ValueError):
        dc.replace(CFG, knn_share_stage3="yes")
