"""A/B the exact kernel's dot precision: HIGHEST (bf16x6, default) vs
HIGH (bf16x3) — time per call and index disagreement vs the HIGHEST run
on the production shapes. Run once per env setting (the knob resolves at
trace time): DGCNN_EXACT_DOT_PREC=high python ... prints the HIGH side.
"""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import os, time
import numpy as np
import jax, jax.numpy as jnp
from bench import make_blocks
from dgcnn_tpu.kernels.knn_pallas import knn_pallas_exact

mode = os.environ.get("DGCNN_EXACT_DOT_PREC", "highest")
x = jnp.asarray(make_blocks()[..., :3])
rngf = np.random.default_rng(1)
feat = jnp.asarray(rngf.normal(size=(8, 7000, 64)).astype(np.float32))

for name, t, kw in (("banded-s1", x, dict(band=2048)),
                    ("fullwidth-C64", feat, dict(band=0))):
    @jax.jit
    def reps(tt, kw=kw):
        acc = jnp.int32(0)
        for _ in range(8):
            acc = acc + knn_pallas_exact(tt, 30, **kw)[0, 0, 0]
        return acc
    float(reps(t))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(reps(t)); ts.append((time.perf_counter()-t0)/8)
    idx = np.asarray(knn_pallas_exact(t, 30, **kw))
    np.save(f"/tmp/exact_prec_{name}_{mode}.npy", idx)
    other = f"/tmp/exact_prec_{name}_highest.npy"
    extra = ""
    if mode != "highest" and os.path.exists(other):
        ref = np.load(other)
        extra = f"  disagrees vs HIGHEST: {(idx != ref).sum()}/{idx.size}"
    print(f"{mode:8s} {name:14s}: {sorted(ts)[2]*1e3:5.2f} ms/call{extra}")
