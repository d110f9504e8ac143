"""REAL multi-process (jax.distributed, 2 local CPU processes) tests:
sharded checkpoint save/restore across processes, try_resume, and
all_processes_agree. Each test spawns two coordinated subprocesses — no
simulation; process_count is genuinely 2."""

import os
import random
import subprocess
import sys

_WORKER = r'''
import os, sys
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
ckpt = sys.argv[3]
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgcnn_tpu.parallel.distributed import all_processes_agree
from dgcnn_tpu.train.checkpoint import (
    save_checkpoint_sharded,
    try_resume,
)

# agreement checks under a real 2-process cluster
assert all_processes_agree(0.5) is True
assert all_processes_agree(float(pid)) is False

mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "points"))
shard = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())

full = np.arange(16 * 32, dtype=np.float32).reshape(16, 32)
local = full[pid * 8 : (pid + 1) * 8]          # this process's rows
big = jax.make_array_from_process_local_data(shard, local, full.shape)
small = jax.make_array_from_process_local_data(
    repl, np.full((4,), 7.0, np.float32), (4,))
state = {"w": big, "b": small}

save_checkpoint_sharded(ckpt, state, epoch=3, mBPCA=0.75)
# both processes see the full directory (shared fs) -> both restore
got = try_resume(ckpt, state)
assert got is not None, "try_resume failed"
restored, meta = got
assert meta == {"epoch": 3.0, "mBPCA": 0.75}, meta
for sh in restored["w"].addressable_shards:
    want = full[sh.index]
    np.testing.assert_array_equal(np.asarray(sh.data), want)
np.testing.assert_array_equal(
    np.asarray(restored["b"].addressable_shards[0].data), 7.0)

# scale-true restore (span accounting): each process decompresses only ITS
# half of the sharded "w" (8 of 16 rows) plus the replicated "b" — never
# the full global arrays
from dgcnn_tpu.train.checkpoint import LAST_RESTORE_STATS as stats
assert stats["global_bytes"] == 16 * 32 * 4 + 4 * 4, stats
assert stats["loaded_bytes"] == 8 * 32 * 4 + 4 * 4, stats
print(f"proc {pid}: OK", flush=True)
'''


def test_two_process_sharded_checkpoint(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = str(random.randint(20000, 40000))
    ckpt = str(tmp_path / "mp_ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port, ckpt],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out
    # two shard files (nonce-suffixed), one per process, plus the manifest
    files = sorted(os.listdir(ckpt))
    assert "manifest.json" in files
    assert any(f.startswith("shards_p0_") and f.endswith(".npz")
               for f in files)
    assert any(f.startswith("shards_p1_") and f.endswith(".npz")
               for f in files)


_TRAIN_WORKER = r'''
import os, sys
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

pid = int(sys.argv[1]); port = sys.argv[2]; ckpt = sys.argv[3]
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

from dgcnn_tpu.models.dgcnn import DGCNNConfig
from dgcnn_tpu.parallel.distributed import global_batch_parts
from dgcnn_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated_sharding,
)
from dgcnn_tpu.train.checkpoint import save_checkpoint_auto, try_resume
from dgcnn_tpu.train.steps import (
    init_train_state, make_optimizer, make_train_step,
)

cfg = DGCNNConfig(num_classes=5, num_features=3, k=5, emb_dims=32,
                  dropout=0.0, knn_query_chunk=None)
mesh = make_mesh(n_data=8, n_points=1)
repl, shard = replicated_sharding(mesh), batch_sharding(mesh)

def put_replicated(tree):
    """Replicate a host pytree onto the global mesh (device_put cannot
    target non-addressable shardings; go leaf-by-leaf through
    make_array_from_process_local_data, unwrapping typed PRNG keys)."""
    def put(x):
        try:
            is_key = jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
        except Exception:
            is_key = False
        raw = np.asarray(jax.random.key_data(x) if is_key else x)
        g = jax.make_array_from_process_local_data(repl, raw, raw.shape)
        return jax.random.wrap_key_data(g) if is_key else g
    return jax.tree_util.tree_map(put, tree)


tx = make_optimizer(lr=1e-3, epochs=8, steps_per_epoch=1)
state = put_replicated(init_train_state(jax.random.key(0), cfg, tx))
step = make_train_step(cfg, tx, donate=False)

# deterministic global batch; each process feeds only ITS rows
B, N = 8, 64
rng = np.random.default_rng(0)
g_pts = rng.normal(size=(B, N, 3)).astype(np.float32)
g_lab = rng.integers(0, cfg.num_classes, (B, N))
per, off = global_batch_parts(B)
pts = jax.make_array_from_process_local_data(
    shard, g_pts[off:off + per], g_pts.shape)
lab = jax.make_array_from_process_local_data(
    shard, g_lab[off:off + per].astype(np.int32), g_lab.shape)
msk = jax.make_array_from_process_local_data(
    shard, np.ones((per, N), np.float32), (B, N))

losses = []
for _ in range(3):
    state, m = step(state, pts, lab, msk)
    losses.append(float(m["loss"]))

save_checkpoint_auto(ckpt, state, epoch=3, mBPCA=0.5)

# resume into a FRESH template (new process semantics) and continue
template = put_replicated(init_train_state(jax.random.key(0), cfg, tx))
got = try_resume(ckpt, template)
assert got is not None, "resume failed"
state2, meta = got
assert meta["epoch"] == 3.0, meta
for _ in range(2):
    state2, m = step(state2, pts, lab, msk)
    losses.append(float(m["loss"]))
print("LOSSES", " ".join(f"{l:.8f}" for l in losses), flush=True)
print(f"proc {pid}: OK", flush=True)
'''


def test_two_process_dp_training_matches_single(tmp_path):
    """3 DP train steps across 2 REAL processes + sharded save + resume +
    2 more steps must reproduce the single-process loss trajectory
    (/root/reference/train.py:18-318 under SURVEY.md SS2's DP plan)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = str(random.randint(20000, 40000))
    ckpt = str(tmp_path / "dp_ckpt")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAIN_WORKER, str(i), port, ckpt],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out

    mp_losses = None
    for line in outs[0].splitlines():
        if line.startswith("LOSSES "):
            mp_losses = [float(v) for v in line.split()[1:]]
    assert mp_losses is not None and len(mp_losses) == 5

    # both processes must report the identical trajectory
    for line in outs[1].splitlines():
        if line.startswith("LOSSES "):
            assert [float(v) for v in line.split()[1:]] == mp_losses

    # single-process ground truth (same seeds, one device, 5 plain steps —
    # the resume in the worker must be loss-transparent)
    import numpy as np

    from dgcnn_tpu.models.dgcnn import DGCNNConfig
    from dgcnn_tpu.train.steps import (
        init_train_state, make_optimizer, make_train_step,
    )
    import jax

    cfg = DGCNNConfig(num_classes=5, num_features=3, k=5, emb_dims=32,
                      dropout=0.0, knn_query_chunk=None)
    tx = make_optimizer(lr=1e-3, epochs=8, steps_per_epoch=1)
    state = init_train_state(jax.random.key(0), cfg, tx)
    step = make_train_step(cfg, tx, donate=False)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(8, 64, 3)).astype(np.float32)
    lab = rng.integers(0, cfg.num_classes, (8, 64)).astype(np.int32)
    msk = np.ones((8, 64), np.float32)
    want = []
    for _ in range(5):
        state, m = step(state, pts, lab, msk)
        want.append(float(m["loss"]))
    # step 1 is pre-divergence (pure forward+loss reassociation): tight.
    # Later steps drift through Adam's rsqrt amplification of f32
    # reassociation differences (measured ~3e-4 rel by step 5) — the
    # trajectory check guards semantics, not bit equality.
    np.testing.assert_allclose(mp_losses[0], want[0], atol=1e-5)
    np.testing.assert_allclose(mp_losses, want, rtol=2e-3)


_CLI_WORKER = r'''
import os, sys
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["DGCNN_JAX_CACHE_DIR"] = ""

pid, port, data_dir, model_root, workdir = sys.argv[1:6]
os.chdir(workdir)

import main as cli

cli.main([
    "--mode", "classifier", "--eval", "0",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2", "--process_id", pid,
    "--data_dir", data_dir, "--num_points", "32",
    "--num_classes", "3", "--num_features", "4", "--k", "4",
    "--emb_dims", "32", "--model_root", model_root,
    "--exp_name", "mp_cli", "--knn_impl", "xla",
    "--epochs", "2", "--batch_size", "8",
    "--validation_batch_size", "8", "--validation_prop", "0.3",
    "--dropout", "0.0", "--scheduler", "cos", "--seed", "3",
])

import jax
assert jax.process_count() == 2
print(f"proc {pid}: OK", flush=True)
'''


def test_two_process_cli_train_matches_single(tmp_path):
    """The reference drives its whole lifecycle from ONE CLI
    (/root/reference/main.py:33-136); the multi-host analogue is the same
    command per host with --coordinator_address/--num_processes/
    --process_id. Two REAL processes train 2 epochs through main.main();
    the printed loss trajectory must match a single-process CLI run on
    identical data, and the checkpoint must be the sharded layout with
    one shard file per process."""
    import re

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(0)
    data_dir = tmp_path / "rooms"
    data_dir.mkdir()
    for i in range(14):  # floor(14*0.3)=4 val rooms, 10 train (batch 8)
        pts = rng.random((200, 4)) * 30
        labels = rng.integers(0, 3, (200, 1))
        np.save(data_dir / f"Area_{i}.npy", np.hstack([pts, labels]))

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS",
                        "XLA_FLAGS")}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = str(random.randint(20000, 40000))
    model_root = tmp_path / "mp_ckpt"
    work = tmp_path / "mp_cwd"
    work.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CLI_WORKER, str(i), port,
             str(data_dir), str(model_root), str(work)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i}: OK" in out

    pat = re.compile(r"Train \d+, loss: ([0-9.]+)")
    mp_losses = [float(m) for m in pat.findall(outs[0])]
    assert len(mp_losses) == 2, outs[0][-2000:]
    assert pat.findall(outs[0]) == pat.findall(outs[1])

    # sharded checkpoint: a directory with a manifest + per-process shards
    ckpt = model_root / "dgcnn_model.npz"
    assert ckpt.is_dir(), os.listdir(model_root)
    files = sorted(os.listdir(ckpt))
    assert "manifest.json" in files
    for pidx in range(2):
        assert any(f.startswith(f"shards_p{pidx}_") for f in files), files

    # single-process ground truth through the very same CLI
    import main as cli

    work1 = tmp_path / "sp_cwd"
    work1.mkdir()
    cwd = os.getcwd()
    os.chdir(work1)
    try:
        cli.main([
            "--mode", "classifier", "--eval", "0",
            "--data_dir", str(data_dir), "--num_points", "32",
            "--num_classes", "3", "--num_features", "4", "--k", "4",
            "--emb_dims", "32", "--model_root", str(tmp_path / "sp_ckpt"),
            "--exp_name", "sp_cli", "--knn_impl", "xla",
            "--epochs", "2", "--batch_size", "8",
            "--validation_batch_size", "8", "--validation_prop", "0.3",
            "--dropout", "0.0", "--scheduler", "cos", "--seed", "3",
        ])
    finally:
        os.chdir(cwd)
    log = (work1 / "checkpoints" / "sp_cli" / "run.log").read_text()
    sp_losses = [float(m) for m in pat.findall(log)]
    assert len(sp_losses) == 2, log[-2000:]
    np.testing.assert_allclose(mp_losses, sp_losses, rtol=2e-3)
