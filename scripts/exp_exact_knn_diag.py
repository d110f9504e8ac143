"""Diagnose knn_pallas_exact vs XLA top_k mismatches at production shape.

The TPU verify of the exact banded kernel showed 48/1.68M index entries
differing from ops/knn.py's lax.top_k path on (8, 7000, 3) k=30. Two
hypotheses:
  (a) NEAR-TIES: the kernel's in-band dot and XLA's einsum accumulate
      the same f32 products in different orders -> 1-ulp score skew flips
      candidates at fp-indistinguishable distances (the documented CPU
      caveat, showing up on TPU at production scale too);
  (b) a REAL selection/certification bug: the kernel returns a strictly
      worse neighbour than lax.top_k under f64 ground-truth scoring.
This classifies every mismatch by the f64 score gap between the two rows.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from dgcnn_tpu.kernels.knn_pallas import knn_pallas_exact
from dgcnn_tpu.ops.knn import knn

rng = np.random.default_rng(7)
x = rng.uniform(0, 30, (8, 7000, 3)).astype(np.float32)
x[..., 1:] = rng.uniform(0, 4, (8, 7000, 2))
order = np.argsort(x[..., 0], axis=1, kind="stable")
x = np.take_along_axis(x, order[..., None], axis=1)
xd = jnp.asarray(x)

want = np.asarray(knn(xd, 30, query_chunk=2048))
got = np.asarray(knn_pallas_exact(xd, 30))
bad = got != want
print(f"mismatched entries: {bad.sum()} / {bad.size}")

ties = real = 0
worst_gap = 0.0
for b, q, j in zip(*np.nonzero(bad)):
    g, w = got[b, q, j], want[b, q, j]
    xq = x[b, q].astype(np.float64)
    sg = 2.0 * x[b, g].astype(np.float64) @ xq - (
        x[b, g].astype(np.float64) ** 2).sum()
    sw = 2.0 * x[b, w].astype(np.float64) @ xq - (
        x[b, w].astype(np.float64) ** 2).sum()
    # f32 representations of the two true scores
    f32_equal = np.float32(sg) == np.float32(sw)
    gap = abs(sg - sw)
    rel = gap / max(abs(sg), abs(sw), 1e-30)
    if f32_equal or rel < 2 ** -22:
        ties += 1
    else:
        real += 1
        worst_gap = max(worst_gap, rel)
        if real <= 5:
            print(f"REAL miss b={b} q={q} j={j}: got row {g} "
                  f"(f64 s={sg!r}) want row {w} (f64 s={sw!r}) "
                  f"rel gap {rel:.3e}")
print(f"near-tie flips (f32-indistinguishable or rel<2^-22): {ties}")
print(f"real selection errors: {real} (worst rel gap {worst_gap:.3e})")
