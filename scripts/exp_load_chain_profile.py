"""Profile the predict() host load chain at 400k points (VERDICT item 8
scoping): which stage would a further native fusion actually shave?

Stages timed separately (median of 5), all on THIS host (nproc=1 — every
"parallel" native section is single-threaded here; real hosts scale):
  1. fused native LAS load (decode + noise + compact)   [predict_load]
  2. DTM build + AGL                                    [worker thread in prod]
  3. block row-indexing + per-block x-sort              [main thread in prod]
In production 2 and 3 OVERLAP on a 2-core+ host; the serial sum here is
the 1-core upper bound.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
import tempfile
import time

import numpy as np

from dgcnn_tpu.eval.predict import predict_load
from dgcnn_tpu.io.las import write_las
from dgcnn_tpu.prepare.blocks import room2blocks
from dgcnn_tpu.prepare.dtm import build_dtm, gen_agl

rng = np.random.default_rng(0)
n, extent = 400_000, 120.0
xy = rng.random((n, 2)) * extent
z = 0.02 * xy[:, 0] + rng.normal(0, 0.1, n)
veg = rng.random(n) < 0.3
z[veg] += rng.random(veg.sum()) * 8 + 0.5
cls = np.where(veg, 5, 2)

tmp = tempfile.mkdtemp()
las = os.path.join(tmp, "tile.las")
write_las(las, xy[:, 0] + 5e5, xy[:, 1] + 6e6, z, cls)
print(f"wrote {las} ({os.path.getsize(las)/1e6:.1f} MB)")


def med(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


t_load, (data, labels) = med(lambda: predict_load(las))
print(f"1. predict_load (native decode+noise+compact): {t_load*1e3:7.1f} ms "
      f"({len(data)} pts kept)")

t_dtm, dtm = med(lambda: build_dtm(data[:, :3]))
t_agl, agl = med(lambda: gen_agl(dtm, data[:, :3]))
print(f"2. build_dtm: {t_dtm*1e3:7.1f} ms   gen_agl: {t_agl*1e3:7.1f} ms")


def blocks():
    r = np.random.default_rng(0)
    bi = room2blocks(data, labels, 7000, block_size=30.0, stride=30.0,
                     random_sample=False, use_all_points=False, rng=r,
                     return_indices=True)
    if len(bi):
        perm = np.argsort(data[:, 0][bi], axis=1, kind="stable")
        bi = np.take_along_axis(bi, perm, axis=1)
    return bi


t_blk, bi = med(blocks)
print(f"3. room2blocks + x-sort: {t_blk*1e3:7.1f} ms ({len(bi)} blocks)")
serial = t_load + t_dtm + t_agl + t_blk
overlap = t_load + max(t_dtm + t_agl, t_blk)
print(f"serial total {serial*1e3:.1f} ms; production overlap bound "
      f"{overlap*1e3:.1f} ms (2+ cores)")

# the round-5 fused native call (decode + noise + DTM + AGL + windows in
# ONE ctypes pass — prepare/tile_load.py; DTMGEN_TILE_PROFILE=1 prints
# per-stage times from inside the call)
from dgcnn_tpu.prepare.tile_load import load_tile_las  # noqa: E402

t_tl, tl = med(lambda: load_tile_las(las))
if tl is None:
    print("4. fused dtmgen_tile_load: unavailable")
else:
    print(f"4. fused dtmgen_tile_load: {t_tl*1e3:7.1f} ms "
          f"(= {serial/t_tl:.2f}x the serial chain; agl engine "
          f"{tl.agl_engine})")
