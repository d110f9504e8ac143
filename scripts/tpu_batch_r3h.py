"""One-process TPU batch for the session: entry check, scatter-unroll
sweep, feature-band qt sweep, bench, then the 30-epoch soak with ALL new
defaults (feature-banded stages 2-3 @4096). One process = one TPU claim
(handoff between processes costs 5-15 min).

    python scripts/tpu_batch_r3h.py > /tmp/tpu_batch_r3h.log 2>&1
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dgcnn_tpu.utils.compilation_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def banner(tag):
    print(f"\n===== {tag} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def main():
    import jax

    banner("entry check")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    out.block_until_ready()
    print("entry forward:", out.shape, out.dtype, flush=True)

    banner("exp_scatter_unroll")
    try:
        from scripts import exp_scatter_unroll

        exp_scatter_unroll.main()
    except Exception as e:
        print("exp_scatter_unroll FAILED:", repr(e), flush=True)

    banner("exp_fb_qt")
    try:
        from scripts import exp_fb_qt

        exp_fb_qt.main()
    except Exception as e:
        print("exp_fb_qt FAILED:", repr(e), flush=True)

    banner("bench")
    try:
        sys.argv = ["bench.py"]
        import bench

        bench.main()
    except Exception as e:
        print("bench FAILED:", repr(e), flush=True)

    banner("soak: full_pipeline_tpu (30 epochs, all-new defaults)")
    try:
        from scripts import full_pipeline_tpu

        full_pipeline_tpu.main()
    except Exception as e:
        print("soak FAILED:", repr(e), flush=True)

    banner("DONE")


if __name__ == "__main__":
    main()
