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
    # two shard files, one per process, plus the manifest
    files = sorted(os.listdir(ckpt))
    assert "manifest.json" in files
    assert "shards_p0.npz" in files and "shards_p1.npz" in files
