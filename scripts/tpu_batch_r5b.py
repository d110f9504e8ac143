"""Round-5 second TPU batch (one process = one TPU claim):

  1. entry check
  2. bench (drift-anchored; e2e section now rides the fused tile load)
  3. exp_bf16_eval_ab — CORRECTED to the production pallas_capped config
     (the r5a run measured the knn_impl='xla' path; VERDICT r4 item 3)
  4. exp_guard_and_prec_cost — now interleaved-rounds (the r5a run timed
     configs sequentially and drift inverted the ordering)
  5. exp_tile_load_ab — warm e2e tile, fused native load vs the
     separate-stage chain (VERDICT r4 item 5 e2e trend)

    python scripts/tpu_batch_r5b.py > /tmp/tpu_batch_r5b.log 2>&1
"""

import os
import runpy
import sys
import time
import traceback

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def banner(tag):
    print(f"\n===== {tag} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def run_stage(tag, fn):
    banner(tag)
    t0 = time.time()
    try:
        fn()
        print(f"[{tag} ok in {time.time()-t0:.0f}s]", flush=True)
    except Exception:
        print(f"{tag} FAILED:", flush=True)
        traceback.print_exc()


def _script(name):
    def thunk():
        runpy.run_path(os.path.join(REPO, "scripts", name),
                       run_name="__main__")

    return thunk


def main():
    import jax

    t0 = time.time()
    d = jax.devices()[0]
    print(f"device up: {d.device_kind} after {time.time()-t0:.0f}s",
          flush=True)

    def entry_check():
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        out.block_until_ready()
        print("entry forward:", out.shape, out.dtype, flush=True)

    def bench_run():
        sys.argv = ["bench.py"]
        import bench

        bench.main()

    run_stage("entry check", entry_check)
    run_stage("bench (fused tile load)", bench_run)
    run_stage("exp_bf16_eval_ab (production config)",
              _script("exp_bf16_eval_ab.py"))
    run_stage("exp_guard_and_prec_cost (interleaved)",
              _script("exp_guard_and_prec_cost.py"))
    run_stage("exp_tile_load_ab", _script("exp_tile_load_ab.py"))
    banner("DONE")


if __name__ == "__main__":
    main()
