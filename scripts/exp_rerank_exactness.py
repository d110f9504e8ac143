"""Why a packed-preselect + f32-re-rank kNN cannot be exact (measurement).

The two-pass idea (VERDICT round-1 item 7): packed kernel preselects
S >= k candidates cheaply, then an exact f32 re-rank of the shortlist.
Exactness requires that no candidate OUTSIDE the shortlist can out-rank a
shortlist member under full f32 comparison — i.e. the truncated 18-bit
score bucket of the S-th winner must not also contain the (S+1)-th
candidate (a "boundary collision"). This script measures the per-row
boundary-collision probability on realistic point data for several S.
Runs on CPU.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

B, N, K = 4, 7000, 30


def main():
    rng = np.random.default_rng(0)
    # LiDAR-ish: clustered, cm-quantized coordinates (worst case for ties)
    xy = rng.integers(0, 3000, (B, N, 2)).astype(np.float32) / 100.0
    z = rng.integers(0, 1500, (B, N, 1)).astype(np.float32) / 100.0
    x = np.concatenate([xy, z], -1)

    d = (
        np.sum(x * x, -1)[:, :, None]
        - 2 * np.einsum("bnc,bmc->bnm", x, x)
        + np.sum(x * x, -1)[:, None, :]
    )
    scores = jnp.asarray(-d)  # higher = nearer, as in the kernel
    bits = jax.lax.bitcast_convert_type(scores.astype(jnp.float32), jnp.int32)
    key = jnp.where(bits >= 0, bits, jnp.int32(-0x80000000) - bits) >> 1
    trunc = np.asarray(key & jnp.int32(~0x1FFF))  # 18-bit packed buckets

    t_sorted = -np.sort(-trunc, axis=-1)  # descending per row
    for s in (32, 40, 64, 128, 256):
        coll = (t_sorted[..., s - 1] == t_sorted[..., s]).mean()
        print(f"S={s:3d}: boundary-collision rate per row = {coll:.3f}")
    rows = B * N
    coll40 = (t_sorted[..., 39] == t_sorted[..., 40]).mean()
    print(
        f"\nAt S=40, ~{coll40*100:.0f}% of rows hit a collision; a batch "
        f"(B=8, N=7000 -> {8*7000:,} rows) would need a whole-batch exact "
        "fallback essentially every step. Per-row fallback is impossible "
        "inside one kernel launch, so the shortlist re-rank cannot be "
        "exact at 18-bit packed precision. (rows measured: "
        f"{rows:,})"
    )


if __name__ == "__main__":
    main()
