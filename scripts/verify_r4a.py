"""TPU verify: exact banded kNN + bf16 fused eval on the real chip."""
import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])
from dgcnn_tpu.utils.compilation_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

# 1) entry forward (production surface)
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print("entry forward:", out.shape, out.dtype, flush=True)

# 2) exact banded kNN vs XLA top_k reference, production shape
from dgcnn_tpu.kernels.knn_pallas import knn_pallas_exact
from dgcnn_tpu.ops.knn import knn
rng = np.random.default_rng(7)
x = rng.uniform(0, 30, (8, 7000, 3)).astype(np.float32)
x[..., 1:] = rng.uniform(0, 4, (8, 7000, 2))
order = np.argsort(x[..., 0], axis=1, kind="stable")
x = jnp.asarray(np.take_along_axis(x, order[..., None], axis=1))
want = np.asarray(knn(x, 30, query_chunk=2048))
got = np.asarray(knn_pallas_exact(x, 30))
print("exact-kNN mismatches vs XLA top_k (TPU, production shape):",
      int((got != want).sum()), "/", got.size, flush=True)

# timing: reps-in-jit with scalar sync
@jax.jit
def reps_exact(x):
    acc = jnp.int32(0)
    for _ in range(10):
        acc = acc + knn_pallas_exact(x, 30)[0, 0, 0]
    return acc
float(reps_exact(x))
t0 = time.perf_counter(); float(reps_exact(x)); t1 = time.perf_counter()
print(f"exact banded kNN: {(t1-t0)/10*1000:.2f} ms/call", flush=True)

# 3) bf16 fused eval stays on the fused path and is not slower than f32
import dataclasses
from dgcnn_tpu.models.dgcnn import DGCNNConfig, apply_dgcnn, init_dgcnn
cfg = DGCNNConfig(num_classes=5, num_features=3, k=30, emb_dims=1024,
                  compute_dtype="bfloat16")
assert cfg._fuse_on, "bf16 auto fuse gate must resolve ON on TPU"
params, state = init_dgcnn(jax.random.key(0), cfg)
xf = x  # (8,7000,3) sorted
def run(c):
    f = jax.jit(lambda p, s, xx: apply_dgcnn(p, s, xx, c, train=False)[0])
    o = f(params, state, xf); float(jnp.sum(o))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); o = f(params, state, xf); float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return np.median(ts) * 1000, np.asarray(o)
ms_bf16, o_bf16 = run(cfg)
ms_f32, o_f32 = run(dataclasses.replace(cfg, compute_dtype=None))
agree = float((o_bf16.argmax(-1) == o_f32.argmax(-1)).mean())
print(f"eval bf16 {ms_bf16:.1f} ms vs f32 {ms_f32:.1f} ms; argmax agreement {agree:.6f}", flush=True)

# 4) recall-guard overhead: default config forward with guard on vs off
cfg_g = DGCNNConfig(num_classes=5, num_features=3, k=30, emb_dims=1024)
ms_on, o_on = run(cfg_g)
ms_off, o_off = run(dataclasses.replace(cfg_g, knn_band_recall_guard=0))
same = bool((o_on == o_off).all())
print(f"forward guard-on {ms_on:.1f} ms vs guard-off {ms_off:.1f} ms; "
      f"bit-equal outputs: {same}", flush=True)
