"""Fused Pallas kNN kernel: distance matmul + exact top-k in VMEM.

THE hot op of DGCNN (/root/reference/model.py:25-40 recomputes a full
(B, N, N) distance matrix 3x per forward). XLA's sort-based ``lax.top_k``
measured ~273 ms per kNN at B=8, N=7000 on v5e; the distance matmul alone
is 1.4 ms. This kernel keeps a (QT, N) score tile resident in VMEM —
scores never touch HBM — and selects the k best per row by iterative
max-extraction:

    per extraction step (k total):
      m    = max_j(scores)                         # row max (VPU reduce)
      col  = max_j((scores == m) ? iota_rev : 0)   # lowest winning column
      scores[col] = -inf                           # knock out

Selection is exact in f32 with deterministic lowest-index tie-breaking
(identical ordering to ``jax.lax.top_k``). Cost is O(k·N) VPU work per row
— far below a full sort — and the MXU matmul is fused in front, so the
kernel reads x from HBM once per batch element and writes only indices.

Layout: N padded to lane multiples (128); padded candidates get -inf
scores via ``cnorm = +inf``. k padded to a multiple of 8 for the output
tile and sliced by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")

# Per-generation sweep results for the query-tile size (rows of the
# resident score tile). Swept on v5e at B=8, N=7000, k=30; other
# generations fall back to the v5e values until swept — override with
# env DGCNN_KNN_QUERY_TILE (both kernels) or the query_tile argument,
# and the VMEM score-tile budget with DGCNN_KNN_VMEM_MB.
_QUERY_TILE_TABLE: dict[str, tuple[int, int]] = {
    # device_kind prefix -> (packed tile, f32 tile)
    "TPU v5 lite": (384, 256),
}
_DEFAULT_TILES = (384, 256)
_DEFAULT_VMEM_MB = 12


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return ""


def _default_query_tile(packed: bool) -> int:
    import os

    env = os.environ.get("DGCNN_KNN_QUERY_TILE")
    if env:
        return int(env)
    kind = _device_kind()
    for prefix, tiles in _QUERY_TILE_TABLE.items():
        if kind.startswith(prefix):
            return tiles[0] if packed else tiles[1]
    tuned = _autotuned_tiles()
    if tuned is not None:
        return tuned[0] if packed else tuned[1]
    return _DEFAULT_TILES[0] if packed else _DEFAULT_TILES[1]


# -------------------------------------------------------------- autotune
# Device generations absent from _QUERY_TILE_TABLE get a one-time
# micro-sweep of the query-tile size (the kernels' only layout knob with
# cross-generation sensitivity: it sets the resident score-tile height) at
# the production shape, cached under ~/.cache/dgcnn_tpu/autotune keyed by
# device_kind. Disable with DGCNN_KNN_AUTOTUNE=0 (falls back to v5e
# constants, the round-2 behaviour).

_TILE_CANDIDATES = (128, 256, 384, 512)
_AUTOTUNED: "tuple[int, int] | None | bool" = False  # False = not resolved


def _autotune_cache_path() -> str:
    import os

    kind = _device_kind() or "unknown"
    base = os.environ.get("DGCNN_AUTOTUNE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "dgcnn_tpu", "autotune"
    )
    return os.path.join(base, kind.replace(" ", "_").replace("/", "_")
                        + ".json")


def _measure_tile(packed: bool, query_tile: int) -> float:
    """Median seconds/call of the production-shape kernel at this tile.
    C=64 is the stage-2/3 feature width — the WIDEST production input, so
    a tile that compiles and wins here is VMEM-safe for every stage (a
    C=3 sweep once picked a tile that OOM'd scoped VMEM at C=64)."""
    import time

    x = jax.random.normal(jax.random.key(0), (2, 7000, 64), jnp.float32)
    kw = dict(packed=True, cap=8, unroll_cap=1) if packed else {}

    def call():
        out = knn_pallas(x, 30, query_tile=query_tile, **kw)
        return float(jnp.sum(out))

    call()
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        trials.append(time.perf_counter() - t0)
    return sorted(trials)[1]


def _autotuned_tiles(measure=None) -> "tuple[int, int] | None":
    """(packed_tile, f32_tile) for this device, from the autotune cache or
    a fresh sweep; None when autotuning is off / not on TPU."""
    global _AUTOTUNED
    if _AUTOTUNED is not False and measure is None:
        return _AUTOTUNED
    import json
    import os
    import sys

    # the kill switch must beat the cache: DGCNN_KNN_AUTOTUNE=0 means
    # "the table/default constants, ignore any tuned tile" — the escape
    # hatch when a cached sweep result is bad
    if os.environ.get("DGCNN_KNN_AUTOTUNE", "1") != "1":
        _AUTOTUNED = None
        return None
    path = _autotune_cache_path()
    if os.path.exists(path):
        try:
            with open(path) as f:
                d = json.load(f)
            _AUTOTUNED = (int(d["packed"]), int(d["f32"]))
            return _AUTOTUNED
        except Exception:
            pass
    if measure is None and jax.default_backend() != "tpu":
        _AUTOTUNED = None
        return None
    measure = measure or _measure_tile
    print(f"dgcnn_tpu: autotuning kNN query tiles for "
          f"{_device_kind() or 'unknown'} (one-time)", file=sys.stderr)
    best = {}
    for packed in (True, False):
        times = {}
        for qt in _TILE_CANDIDATES:
            try:
                times[qt] = measure(packed, qt)
            except Exception:
                continue
        if not times:
            _AUTOTUNED = None
            return None
        best["packed" if packed else "f32"] = min(times, key=times.get)
    _AUTOTUNED = (best["packed"], best["f32"])
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"packed": best["packed"], "f32": best["f32"],
                       "device_kind": _device_kind()}, f)
    except OSError:
        pass  # cache write is best-effort; the sweep result still applies
    return _AUTOTUNED


def _vmem_budget_bytes() -> int:
    import os

    return int(
        float(os.environ.get("DGCNN_KNN_VMEM_MB", _DEFAULT_VMEM_MB)) * 2**20
    )


def _exact_dot_precision():
    """Distance-dot precision for the EXACT kernels: HIGHEST (bf16x6 on
    TPU — 1.8e-7 rel, f32-class). DEFAULT (bf16x1) is not an option:
    4.3e-3 rel score error flips real rankings (scripts/
    exp_dot_precision_probe.py). HIGH (bf16x3, would halve the passes)
    does NOT lower in Mosaic — `NotImplementedError: Unsupported dot
    precision: HIGH` on v5e (scripts/exp_exact_prec_ab.py) — so there is
    no middle tier to offer."""
    return jax.lax.Precision.HIGHEST


from dgcnn_tpu.kernels.gather_pallas import _round_up  # shared helper


def _knn_kernel_packed_split(
    x_ref, q_ref, cnorm_ref, idx_ref, packed_scr, idx_scr, *, k_pad, n_pad,
    splits, k_real=None,
):
    """Split-extraction variant: the candidate axis is cut into ``splits``
    independent slices, each running its own k-extraction loop *in the same
    fori body* — the per-slice max-reduce chains have no data dependence, so
    the VPU can overlap them (the single-loop version is latency-bound on
    one serial reduce chain). The per-slice winners (globally packed keys,
    so they carry global columns and a global tie order) are then merged by
    one cheap extraction over splits*k_pad lanes. Result is identical to
    the single-loop packed kernel."""
    q = q_ref[0]
    x = x_ref[0]
    scores = 2.0 * jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # see _knn_kernel_packed
    ) - cnorm_ref[0]
    scores = scores - jnp.sum(q * q, axis=1, keepdims=True)
    qt = q.shape[0]
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(bits >= 0, bits, jnp.int32(-0x80000000) - bits)
    iota = jax.lax.broadcasted_iota(jnp.int32, (qt, n_pad), 1)
    packed_scr[:] = (key & jnp.int32(~0x1FFF)) | (jnp.int32(n_pad - 1) - iota)

    w = n_pad // splits
    neg_inf = jnp.int32(-0x80000000)
    m_pad = splits * k_pad
    k_iota_m = jax.lax.broadcasted_iota(jnp.int32, (qt, m_pad), 1)
    idx_scr[:] = jnp.full((qt, m_pad), neg_inf, jnp.int32)

    def body(j, _):
        for s in range(splits):
            sl = packed_scr[:, s * w : (s + 1) * w]
            m = jnp.max(sl, axis=1, keepdims=True)
            # stash winner into the merge scratch at column s*k_pad + j
            idx_scr[:] = jnp.where(
                k_iota_m == s * k_pad + j, m, idx_scr[:]
            )
            packed_scr[:, s * w : (s + 1) * w] = jnp.where(
                sl == m, neg_inf, sl
            )
        return ()

    jax.lax.fori_loop(0, k_real or k_pad, body, (), unroll=False)

    # merge: top k_pad of the splits*k_pad winner keys
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)
    out = jnp.zeros((qt, k_pad), jnp.int32)

    def merge_body(j, out):
        cand = idx_scr[:]
        m = jnp.max(cand, axis=1, keepdims=True)
        col = jnp.int32(n_pad - 1) - (m & jnp.int32(0x1FFF))
        out = jnp.where(k_iota == j, col, out)
        idx_scr[:] = jnp.where(cand == m, neg_inf, cand)
        return out

    out = jax.lax.fori_loop(0, k_real or k_pad, merge_body, out, unroll=False)
    idx_ref[0] = out


def _knn_kernel_packed_capped(
    x_ref, q_ref, cnorm_ref, inv_ref, idx_ref, packed_scr, win_scr,
    *, k_pad, n_pad, window, cap, k_real=None, unroll_cap=1,
    unroll_merge=0, idx_bits=13,
):
    """Hierarchical (capped) packed-key extraction — the fast approximate
    top-k for production inference.

    The flat packed kernel pays ``k`` full-width passes (one wrapped
    subtract + one max-reduce over the whole (QT, N) tile per extracted
    neighbour). Here the candidate axis is cut into ``W = n_pad/window``
    vreg-aligned windows and each window extracts only its top-``cap``
    keys — ``cap`` full-width passes with W independent reduce chains
    (deep ILP) — then one cheap merge selects the global top-k from the
    (QT, W*cap) per-window winners. Work drops ~k/cap-fold on the
    dominant term.

    Approximation: a query loses a true neighbour only when more than
    ``cap`` of its top-k live in ONE window. The caller disperses
    candidate columns with a stride permutation (adjacent input points
    round-robin across windows), so spatially-sorted LiDAR blocks spread
    each neighbourhood ~uniformly: expected per-window load is
    k/W ≈ 1, and P(window > cap) is a deep Poisson tail (measured ≥
    99.99% neighbour recall vs the flat packed kernel; exact-equal when
    no window overflows). Keys carry the ORIGINAL column id (via
    ``inv_ref``), so tie order and output indices match the flat packed
    kernel wherever no cap overflow occurs.

    The kernel runs TRANSPOSED relative to the flat packed kernel: scores
    are (n_pad, qt) — candidates on sublanes, queries on lanes. Every
    structural step is then layout-free on TPU: the window split
    (n_pad, qt) -> (n_win, window, qt) is a major-dim shape cast (no data
    movement), per-window maxima are natural sublane reductions, and the
    (n_win, cap, qt) winners concatenate/flatten on major dims straight
    into the merge tile. (The query-major orientation needs a
    transpose+reshape between phases that Mosaic cannot lower; a python
    loop over per-window lane slices compiles but runs ~9x SLOWER than
    the flat kernel — each small slice op carries fixed issue overhead
    and the scratch stores serialise.) The output tile is (k_pad, qt);
    the caller transposes once outside the kernel.

    inv_ref: (1, n_pad, 1) i32 — per PERMUTED row, the value
        ``(n_pad-1) - original_index`` to pack into the low 13 bits.
    packed_scr: (n_win, window, qt) i32 — window-split keys.
    """
    q = q_ref[0]
    x = x_ref[0]
    scores = 2.0 * jax.lax.dot_general(
        x, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # see _knn_kernel_packed
    ) - cnorm_ref[0]                       # (n_pad, qt)
    # per-query |q|^2 subtraction: keys quantize -|x-q|^2 directly
    # (see _knn_kernel_packed) — ranking unchanged, precision ~exact
    scores = scores - jnp.sum(q * q, axis=1)[None, :]
    qt = q.shape[0]
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(bits >= 0, bits, jnp.int32(-0x80000000) - bits) >> 1
    imask = jnp.int32((1 << idx_bits) - 1)
    packed = (key & ~imask) | inv_ref[0]

    n_win = n_pad // window
    int_min = jnp.int32(-0x80000000)
    packed_scr[:] = packed.reshape(n_win, window, qt)

    # Per-window wrapped-subtract chains, ALL windows in one traced op per
    # step: t = keys - (m_prev + INT_MIN); a sublane max-reduce gives
    # every window's next winner at once. m_prev starts at an upper bound
    # (keys are >>1 so they live in (-2^30, 2^30]; 2^30+1 keeps every
    # difference inside int32).
    #
    # Loop structure is a compile-time/runtime knob: the cap-loop body
    # touches the FULL (n_win, window, qt) tile (~2.7k vregs/op at
    # production shape), so a python unroll (`unroll_cap=0`) multiplies
    # the Mosaic instruction stream by ``cap`` — fastest steady-state but
    # minutes of compile inside big jit programs; `unroll_cap=j` uses
    # fori_loop with that unroll factor. The merge loop's tile is tiny
    # (n_win*cap sublanes), so unrolling it (`unroll_merge=0`) is cheap
    # and keeps winners as SSA values.
    upper = jnp.int32((1 << 30) + 1)
    m0 = jnp.full((n_win, 1, qt), upper)

    if unroll_cap == 0:
        m_prev = m0
        for j in range(cap):
            t = packed_scr[:] - (m_prev + int_min)
            t_max = jnp.max(t, axis=1, keepdims=True)
            m_prev = m_prev + (t_max + int_min)
            win_scr[:, j : j + 1, :] = m_prev
    else:
        # Mosaic's fori supports unroll=1 or the full trip count only, so
        # partial unrolling (the fori-vs-unrolled gap is ~175 us per loop
        # iteration) is done by hand: ``u`` dependent extraction steps per
        # body, stores at dslice(u*i + t).
        u = unroll_cap if cap % unroll_cap == 0 else 1

        def body(i, m_prev):
            base = i * u
            m = m_prev
            for t_off in range(u):
                t = packed_scr[:] - (m + int_min)
                t_max = jnp.max(t, axis=1, keepdims=True)
                m = m + (t_max + int_min)
                win_scr[:, pl.dslice(base + t_off, 1), :] = m
            return m

        jax.lax.fori_loop(0, cap // u, body, m0, unroll=False)

    # Merge: global top-k over the (n_win, cap, qt) winner keys — a
    # ~cap/window-width tile, so the k extraction steps are cheap. Same
    # wrapped-subtract; winner keys are globally unique (distinct packed
    # row ids), so maxima strictly decrease across the merged tile too.
    kr = k_real or k_pad
    m0m = jnp.full((1, 1, qt), upper)

    if unroll_merge == 0:
        m = m0m
        cols = []
        for _ in range(kr):
            t = win_scr[:] - (m + int_min)
            t_max = jnp.max(
                jnp.max(t, axis=0, keepdims=True), axis=1, keepdims=True
            )
            m = m + (t_max + int_min)
            cols.append(jnp.int32(n_pad - 1) - (m & imask))
        out = jnp.concatenate(cols, axis=1)[0]     # (kr, qt)
        if kr < k_pad:
            out = jnp.concatenate(
                [out, jnp.zeros((k_pad - kr, qt), jnp.int32)], axis=0
            )
        idx_ref[0] = out
    else:
        def merge_body(j, m):
            t = win_scr[:] - (m + int_min)
            t_max = jnp.max(
                jnp.max(t, axis=0, keepdims=True), axis=1, keepdims=True
            )
            m = m + (t_max + int_min)
            col = jnp.int32(n_pad - 1) - (m & imask)
            idx_ref[0, pl.dslice(j, 1), :] = col[0]
            return m

        jax.lax.fori_loop(0, kr, merge_body, m0m, unroll=unroll_merge)


def _knn_kernel_banded(
    start_ref, x_ref, q_ref, cnorm_ref, idx_ref, key_ref, packed_scr,
    win_scr, *, band, n_win, cap, k_pad, n_pad, k_real, idx_bits,
    unroll_cap=0, unroll_merge=0, study=None, hi_prec=False,
):
    """Banded capped extraction for SORTED point clouds (stage-1 kNN).

    Production blocks are x-sorted (data/dataset.py::sort_points), so a
    query's true neighbours live near it in row order: every candidate
    outside a contiguous row band [start, start+band) has squared
    distance >= (x_q - x_edge)^2 (the coordinate-sorted lower bound). The
    kernel therefore scores only the ``band`` rows around each query tile
    — ~n_pad/band-fold less matmul AND extraction work than the full
    capped kernel (/root/reference/model.py:25-40 scores all N^2 pairs).

    Exactness is certified per query OUTSIDE the kernel: the kth winner's
    packed key (written to ``key_ref``) is compared against the packed
    band-edge bound; failing queries (sparse regions — measured 0.09% on
    realistic ALS tiles at band=3072, 0% on uniform blocks) are re-solved
    f32-exactly by the caller (:func:`knn_pallas_banded`). Certified rows
    carry the capped-class approximation only (in-band per-window cap
    overflow, a deep Poisson tail at lambda = k/n_win ~ 0.94).

    Layout: scores are computed TRANSPOSED, (band, qt) — and the window
    split is the free major-axis reshape (band, qt) ->
    (band//n_win, n_win, qt), which lands row r in window ``r % n_win``:
    index-adjacent (spatially adjacent) candidates round-robin across
    windows, so no host-side stride permutation of the table is needed
    (the full capped kernel pre-permutes in HBM). Per-window top-cap
    chains reduce over the LEADING axis (cross-vreg elementwise max).

    start_ref: (1, 1, 1) SMEM — this tile's 128-aligned band start row.
    key_ref:   (1, 1, qt) — the k-th winner's packed key per query.
    """
    start = start_ref[0, 0, 0]
    q = q_ref[0]
    qt = q.shape[0]
    xb = x_ref[0, pl.dslice(start, band), :]          # (band, c_pad)
    cnb = cnorm_ref[0, pl.dslice(start, band), :]     # (band, 1)
    if study == "no_mm":
        # ablation: skip the distance matmul, keep everything downstream
        # (pack + extraction + merge) — isolates the MXU share
        scores = -cnb - jnp.sum(q * q, axis=1)[None, :]   # (band, qt)
    elif study == "bf16_mm":
        # ablation: bf16 operands for the distance dot (the production dot
        # is f32-in/default-precision — one bf16 MXU pass already)
        scores = 2.0 * jax.lax.dot_general(
            xb.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) - cnb
        scores = scores - jnp.sum(q * q, axis=1)[None, :]
    else:
        # hi_prec: the stage-1 band-edge CERTIFICATE's soundness needs
        # f32-class scores — the TPU default truncates f32 operands to
        # bf16, rel error ~2^-9 >> the one-quantum certificate margin
        # (scripts/exp_dot_precision_probe.py) — and the feature-space
        # callers flipped to HIGHEST too in round 4 (+0.2 ms/call = +6%,
        # exp_guard_and_prec_cost.py: bf16 dot error swamped the 18-bit
        # key precision and capped trained agreement at ~0.9993).
        # study-ablation callers may pass False to isolate the bf16 dot.
        scores = 2.0 * jax.lax.dot_general(
            xb, q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if hi_prec else None),
        ) - cnb                                       # (band, qt)
        scores = scores - jnp.sum(q * q, axis=1)[None, :]
    if study == "score_only":
        # ablation: matmul + epilogue only; one max pass forces full
        # evaluation, outputs are junk (study harness never reads them
        # for correctness)
        red = jax.lax.bitcast_convert_type(
            jnp.max(scores, axis=0, keepdims=True), jnp.int32)  # (1, qt)
        key_ref[0] = red
        idx_ref[0] = jnp.broadcast_to(red, (k_pad, qt))
        return
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(bits >= 0, bits, jnp.int32(-0x80000000) - bits) >> 1
    imask = jnp.int32((1 << idx_bits) - 1)
    # in-band row r packs (band-1-r): max over equal scores -> lowest row
    # (= lowest original index; the band is a contiguous slice of the
    # original order), matching lax.top_k tie order
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (band, qt), 0)
    packed = (key & ~imask) | (jnp.int32(band - 1) - r_iota)

    w_sz = band // n_win
    int_min = jnp.int32(-0x80000000)
    packed_scr[:] = packed.reshape(w_sz, n_win, qt)

    if study == "no_extract":
        # ablation: score + pack + scratch store + ONE max pass; skips the
        # cap extraction passes and the merge — outputs are junk
        red = jnp.max(packed_scr[:], axis=(0, 1), keepdims=True)  # (1,1,qt)
        key_ref[0] = red[0]
        idx_ref[0] = jnp.broadcast_to(red[0], (k_pad, qt))
        return

    upper = jnp.int32((1 << 30) + 1)
    m0 = jnp.full((1, n_win, qt), upper)
    if unroll_cap == 0:
        m_prev = m0
        for j in range(cap):
            t = packed_scr[:] - (m_prev + int_min)
            t_max = jnp.max(t, axis=0, keepdims=True)
            m_prev = m_prev + (t_max + int_min)
            win_scr[pl.dslice(j, 1), :, :] = m_prev
    else:
        u = unroll_cap if cap % unroll_cap == 0 else 1

        def body(i, m_prev):
            base = i * u
            m = m_prev
            for t_off in range(u):
                t = packed_scr[:] - (m + int_min)
                t_max = jnp.max(t, axis=0, keepdims=True)
                m = m + (t_max + int_min)
                win_scr[pl.dslice(base + t_off, 1), :, :] = m
            return m

        jax.lax.fori_loop(0, cap // u, body, m0, unroll=False)

    # merge: global top-k over the (cap, n_win, qt) winners
    m0m = jnp.full((1, 1, qt), upper)
    if unroll_merge == 0:
        m = m0m
        cols = []
        for _ in range(k_real):
            t = win_scr[:] - (m + int_min)
            t_max = jnp.max(
                jnp.max(t, axis=0, keepdims=True), axis=1, keepdims=True
            )
            m = m + (t_max + int_min)
            cols.append(start + jnp.int32(band - 1) - (m & imask))
        out = jnp.concatenate(cols, axis=1)[0]        # (k_real, qt)
        if k_real < k_pad:
            out = jnp.concatenate(
                [out, jnp.zeros((k_pad - k_real, qt), jnp.int32)], axis=0
            )
        idx_ref[0] = out
        key_ref[0] = m[0]
    else:
        def merge_body(j, m):
            t = win_scr[:] - (m + int_min)
            t_max = jnp.max(
                jnp.max(t, axis=0, keepdims=True), axis=1, keepdims=True
            )
            m = m + (t_max + int_min)
            col = start + jnp.int32(band - 1) - (m & imask)
            idx_ref[0, pl.dslice(j, 1), :] = col[0]
            return m

        m = jax.lax.fori_loop(0, k_real, merge_body, m0m,
                              unroll=unroll_merge)
        key_ref[0] = m[0]
        if k_real < k_pad:
            idx_ref[0, pl.dslice(k_real, k_pad - k_real), :] = jnp.zeros(
                (k_pad - k_real, qt), jnp.int32
            )


def _knn_kernel_exact_banded(
    start_ref, x_ref, q_ref, cnorm_ref, idx_ref, kth_ref, ovf_ref,
    key_scr, wkey_scr, wrow_scr, *, band, n_win, cap, k_pad, k_real,
    unroll_cap=0, unroll_merge=0,
):
    """Banded f32-EXACT capped extraction — the bit-exact production path.

    Same band/window layout as :func:`_knn_kernel_banded`, but selection
    is exact: keys are the order-EXACT monotone int32 transform of the
    f32 scores (no quantization, no packed index bits), per-window
    extraction resolves the winning row with an explicit tie plane
    (lowest row among equal scores — ``lax.top_k`` order,
    /root/reference/model.py:25-40 semantics) and knocks out exactly that
    row, and the merge is exactly lexicographic on (score desc, row asc).

    Hidden-candidate certification is built in: a window that still holds
    an unextracted in-band candidate can only hide rows whose key is <=
    its cap-th winner, so ``ovf_ref`` flags every query whose k-th global
    winner does NOT strictly beat every window's cap-th winner. Flagged
    queries are re-solved f32-exactly by the caller
    (:func:`knn_pallas_exact`); certified rows are bit-identical to
    ``lax.top_k`` over the same scores. The out-of-band (band-edge)
    certificate also lives in the caller — ``kth_ref`` carries each
    query's k-th winner key for it.

    Scores are ``2 q.c - |c|^2`` exactly as the flat kernels and the XLA
    reference compute them (ops/knn.py drops the row-constant ``-|q|^2``;
    no per-query recentering here — exactness requires the very same f32
    values ``lax.top_k`` would rank).
    """
    start = start_ref[0, 0, 0]
    q = q_ref[0]
    qt = q.shape[0]
    xb = x_ref[0, pl.dslice(start, band), :]           # (band, c_pad)
    cnb = cnorm_ref[0, pl.dslice(start, band), :]      # (band, 1)
    # The dot MUST run in the reference q-major orientation (einsum
    # 'qc,nc->qn', ops/knn.py::_knn_scores): the n-major orientation
    # diverges by 1 ulp on ~4e-5 of scores under XLA-CPU (interpret
    # tests), flipping near-tie orderings vs lax.top_k. The int32 keys
    # are then transposed into the windowed (band, qt) layout — Mosaic
    # lowers the 2-D transpose (scripts/exp_transpose_probe.py: lowered
    # + bit-exact at (512, 2048) i32 on v5e).
    scores = 2.0 * jax.lax.dot_general(
        q, xb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # High precision is load-bearing: the TPU's DEFAULT matmul
        # precision truncates f32 operands to bf16 (measured 4.3e-3 max
        # rel score error — scripts/exp_dot_precision_probe.py), which
        # flips real rankings; HIGHEST is f32-class (1.8e-7).
        precision=_exact_dot_precision(),
    ) - cnb[:, 0][None, :]                             # (qt, band)
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(bits >= 0, bits, jnp.int32(-0x80000000) - bits)
    key = jnp.swapaxes(key, 0, 1)                      # (band, qt)
    w_sz = band // n_win
    key_scr[:] = key.reshape(w_sz, n_win, qt)
    # entry [s, w, q] holds in-band row r = s*n_win + w; rev = band-1-r
    # so a max over equal scores picks the LOWEST row (top_k tie order).
    # rev >= 0 for real entries; the tie plane's miss value is -1.
    r_s = jax.lax.broadcasted_iota(jnp.int32, (w_sz, n_win, qt), 0)
    r_w = jax.lax.broadcasted_iota(jnp.int32, (w_sz, n_win, qt), 1)
    rev = jnp.int32(band - 1) - (r_s * n_win + r_w)
    # knockout value: INT_MIN ranks strictly below every real key, and
    # below key(-inf) = INT_MIN - bits(-inf) (the padded-row score)
    knock = jnp.int32(-0x80000000)

    if unroll_cap == 0:
        for j in range(cap):
            ks = key_scr[:]
            m = jnp.max(ks, axis=0, keepdims=True)      # (1, n_win, qt)
            rv = jnp.max(jnp.where(ks == m, rev, jnp.int32(-1)),
                         axis=0, keepdims=True)
            wkey_scr[pl.dslice(j, 1), :, :] = m
            wrow_scr[pl.dslice(j, 1), :, :] = rv
            key_scr[:] = jnp.where(rev == rv, knock, ks)
    else:
        u = unroll_cap if cap % unroll_cap == 0 else 1

        def body(i, _):
            base = i * u
            for t_off in range(u):
                ks = key_scr[:]
                m = jnp.max(ks, axis=0, keepdims=True)
                rv = jnp.max(jnp.where(ks == m, rev, jnp.int32(-1)),
                             axis=0, keepdims=True)
                wkey_scr[pl.dslice(base + t_off, 1), :, :] = m
                wrow_scr[pl.dslice(base + t_off, 1), :, :] = rv
                key_scr[:] = jnp.where(rev == rv, knock, ks)
            return ()

        jax.lax.fori_loop(0, cap // u, body, (), unroll=False)

    # cap-th winner per window, saved before the merge knocks entries out:
    # hidden in-window candidates are all <= it
    capmax = jnp.max(wkey_scr[pl.dslice(cap - 1, 1), :, :],
                     axis=1, keepdims=True)             # (1, 1, qt)

    # Merge: global top-k over the (cap, n_win, qt) winners, exactly
    # lexicographic — max key, then lowest row among key ties. Winner rows
    # are globally unique (each in-band row wins at most once), so the
    # knockout keys purely on the row plane.
    def merge_step(j_store, _):
        wk = wkey_scr[:]
        m = jnp.max(jnp.max(wk, axis=0, keepdims=True),
                    axis=1, keepdims=True)              # (1, 1, qt)
        rv = jnp.max(
            jnp.max(jnp.where(wk == m, wrow_scr[:], jnp.int32(-1)),
                    axis=0, keepdims=True),
            axis=1, keepdims=True)                      # (1, 1, qt)
        col = start + jnp.int32(band - 1) - rv
        idx_ref[0, j_store, :] = col[0]
        wkey_scr[:] = jnp.where(wrow_scr[:] == rv, knock, wk)
        return m

    if unroll_merge == 0:
        m = None
        for j in range(k_real):
            m = merge_step(pl.dslice(j, 1), None)
    else:
        m = jax.lax.fori_loop(
            0, k_real,
            lambda j, mm: merge_step(pl.dslice(j, 1), mm),
            jnp.zeros((1, 1, qt), jnp.int32), unroll=unroll_merge)
    if k_real < k_pad:
        idx_ref[0, pl.dslice(k_real, k_pad - k_real), :] = jnp.zeros(
            (k_pad - k_real, qt), jnp.int32)
    kth_ref[0] = m[0]
    # overflow: some window's cap-th winner is >= the k-th global winner —
    # that window may hide better (or tie-displacing) candidates
    ovf_ref[0] = (capmax >= m).astype(jnp.int32)[0]


def _knn_kernel_packed(
    x_ref, q_ref, cnorm_ref, idx_ref, packed_scr, idx_scr, *, k_pad, n_pad,
    unroll=1, k_real=None, idx_bits=13,
):
    """Packed-key variant: each score is collapsed to a single int32 key —
    the float's order-preserving integer transform truncated to its top 19
    bits, with ``(n_pad-1) - column`` in the low 13 bits. One max-reduce
    then one compare+select per extraction step (vs ~7 full-width ops for
    the f32 kernel), at the cost of ranking at reduced score precision
    (ties broken toward the lower column, matching top_k). ``idx_bits``
    (13 up to n_pad=8192, at most 15 / n_pad=32768) sets the index field;
    score keys carry the remaining 31-idx_bits bits."""
    q = q_ref[0]
    x = x_ref[0]
    scores = 2.0 * jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # round 4: f32-class scoring everywhere — the TPU DEFAULT
        # truncates f32 operands to bf16 (4.3e-3 rel, swamping the
        # 18-bit key precision; scripts/exp_dot_precision_probe.py);
        # HIGHEST costs ~6% of the kernel (exp_guard_and_prec_cost.py)
        precision=jax.lax.Precision.HIGHEST,
    ) - cnorm_ref[0]
    # Per-query re-centering before quantization: subtracting |q_i|^2
    # (constant per row — ranking unchanged) turns each score into exactly
    # -|x_j - q_i|^2, so the packed key quantizes the DISTANCE itself
    # (relative resolution ~2^-9 of each d^2) instead of a coordinate-
    # magnitude-inflated surrogate. Measured: set recall vs f32-exact
    # 0.93 -> ~1.0 at the production shape on 30 m blocks.
    scores = scores - jnp.sum(q * q, axis=1, keepdims=True)

    qt = q.shape[0]
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    # monotone int transform: s>=0 -> bits; s<0 -> INT_MIN - bits
    # (verified order-equivalent to f32 compare; +-0 collide harmlessly).
    # The >>1 (arithmetic) halves the key range to (-2^30, 2^30] so any
    # difference of two packed keys fits int32 — required by the wrapped-
    # subtract extraction below. Net score precision: top 18 bits.
    key = jnp.where(bits >= 0, bits, jnp.int32(-0x80000000) - bits) >> 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (qt, n_pad), 1)
    imask = jnp.int32((1 << idx_bits) - 1)
    packed = (key & ~imask) | (jnp.int32(n_pad - 1) - iota)
    packed_scr[:] = packed

    k_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)
    int_min = jnp.int32(-0x80000000)

    # Packed keys are UNIQUE (distinct low-13-bit column fields), so the
    # sequence of row maxima is strictly decreasing: step j's winner is
    # max{p : p < m_{j-1}} — no knockout writeback needed. The eligibility
    # compare folds into the max via one wrapped subtract: with all key
    # differences inside int32 (the >>1 above),
    #     t = p - (m_prev + INT_MIN)
    # maps eligible keys (p < m_prev) to positives ordered like p and
    # ineligible ones far negative, so a single max-reduce does
    # compare+select;  m_new = m_prev + (t_max + INT_MIN)  unwraps.
    def body(j, m_prev):
        p = packed_scr[:]
        t = p - (m_prev + int_min)           # wraps; eligible -> positive
        t_max = jnp.max(t, axis=1, keepdims=True)              # (QT, 1)
        m = m_prev + (t_max + int_min)       # unwrap
        col = jnp.int32(n_pad - 1) - (m & imask)
        idx_scr[:] = jnp.where(k_iota == j, col, idx_scr[:])
        return m

    m0 = jnp.max(packed, axis=1, keepdims=True) + jnp.int32(1)
    jax.lax.fori_loop(0, k_real or k_pad, body, m0, unroll=unroll)
    idx_ref[0] = idx_scr[:]


def _knn_kernel(
    x_ref, q_ref, cnorm_ref, idx_ref, scores_scr, idx_scr, *, k_pad, n_pad,
    k_real=None,
):
    """One (batch, query-tile) program.

    x_ref:     (1, N_pad, C)  candidates (revisited across query tiles)
    q_ref:     (1, QT, C)     query tile
    cnorm_ref: (1, 1, N_pad)  candidate squared norms (+inf on padding)
    idx_ref:   (1, QT, k_pad) output neighbour indices
    scores_scr:(QT, N_pad)    f32 scratch — the resident score tile
    idx_scr:   (QT, k_pad)    i32 scratch — selected indices
    """
    q = q_ref[0]
    x = x_ref[0]
    scores = 2.0 * jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # f32-exact claim needs high precision: the TPU default truncates
        # f32 operands to bf16 (4.3e-3 rel — exp_dot_precision_probe.py)
        precision=_exact_dot_precision(),
    ) - cnorm_ref[0]
    scores_scr[:] = scores

    qt = q.shape[0]
    # iota_rev: higher value = lower column, so a max() over winners picks
    # the lowest-index column among score ties (lax.top_k tie order)
    iota_rev = n_pad - jax.lax.broadcasted_iota(jnp.int32, (qt, n_pad), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (qt, k_pad), 1)

    # (A no-writeback lexicographic variant — mask by "lex-below previous
    # winner" instead of knocking out — measured SLOWER here: the two extra
    # compare planes cost more than the saved write. The packed kernel gets
    # the no-writeback win because its unique keys need no tie plane.)
    def body(j, _):
        s = scores_scr[:]
        m = jnp.max(s, axis=1, keepdims=True)                 # (QT, 1)
        col_rev = jnp.max(
            jnp.where(s == m, iota_rev, 0), axis=1, keepdims=True
        )                                                     # (QT, 1)
        idx_scr[:] = jnp.where(k_iota == j, n_pad - col_rev, idx_scr[:])
        scores_scr[:] = jnp.where(iota_rev == col_rev, _NEG_INF, s)
        return ()

    jax.lax.fori_loop(0, k_real or k_pad, body, (), unroll=False)
    idx_ref[0] = idx_scr[:]


def knn_pallas(
    x: jax.Array,
    k: int,
    *,
    query_tile: int | None = None,
    interpret: bool | None = None,
    packed: bool = False,
    splits: int = 1,
    cap: int = 0,
    window: int = 256,
    unroll_cap: int = 1,
    unroll_merge: int = 0,
    queries: jax.Array | None = None,
) -> jax.Array:
    """Public wrapper: defaults ``interpret`` to True off-TPU so the same
    model config runs under CPU tests and the TPU Mosaic path in prod.
    ``packed=True`` selects the packed-key kernel (~2x faster extraction,
    ranking at reduced score precision; requires padded N <= 8192);
    ``splits`` cuts its extraction into independent slices (measured slower
    on v5e — strided slice access beats any ILP gain — kept for study;
    results are identical to splits=1). ``cap > 0`` (with ``packed``)
    selects the hierarchical capped kernel: per-``window`` top-``cap``
    extraction + merge, ~k/cap-fold less reduce work, exact-equal to the
    flat packed kernel unless >cap of a row's top-k land in one window
    (see _knn_kernel_packed_capped; candidate columns are stride-dispersed
    so that needs a pathological index-modular cluster). ``unroll_cap``/
    ``unroll_merge`` pick the capped kernel's loop structure (0 = python
    unroll: fastest steady state, instruction stream scales with cap/k;
    >=1 = fori_loop with that unroll factor — Mosaic currently supports
    only 1 or the full trip count). Measured v5e @ B=8,N=7000: unrolled
    cap loop 7.3 ms/call vs fori 8.8; compile ~2 s vs ~0.4 s per kernel
    instance standalone, but minutes vs seconds inside the full train
    program (scripts/exp_capped_unroll.py). ``queries`` (B, M, C) asks
    for the k nearest rows OF ``x`` for each query row instead of
    self-kNN — the repair path of :func:`knn_pallas_banded` uses this
    with the f32-exact kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if query_tile is None:
        query_tile = _default_query_tile(packed)
    if cap and not packed:
        raise ValueError("cap requires packed=True")
    if cap and window % 128:
        raise ValueError("window must be a multiple of 128")
    n_pad = -(-x.shape[1] // (window if cap else 128)) * (
        window if cap else 128
    )
    # the kernel keeps a (query_tile, N_pad) score tile in VMEM; beyond
    # the budget it no longer fits — fall back to the chunked XLA
    # path (the point-sharded ring kNN is the intended path for huge N)
    vmem_budget = _vmem_budget_bytes()
    while query_tile > 64 and query_tile * n_pad * 4 > vmem_budget:
        query_tile //= 2
    if query_tile * n_pad * 4 > vmem_budget:
        if queries is not None:
            raise ValueError(
                f"n={x.shape[1]} exceeds the kernel VMEM budget for the "
                "queries variant (no chunked-XLA fallback takes separate "
                "queries)"
            )
        from dgcnn_tpu.ops.knn import knn as knn_xla

        return knn_xla(x, k, query_chunk=1024)
    # index field width: 13 bits up to n_pad=8192 (18-bit score keys, the
    # production regime), widening to at most 15 bits / n_pad=32768 for
    # whole-room inputs (score keys narrow to 16 bits — ranking gets
    # coarser; the trained-model evidence in BASELINE.md covers 13-bit).
    idx_bits = max(13, (n_pad - 1).bit_length())
    if packed and idx_bits > 15:
        packed = False
        cap = 0
    if splits > 1 and n_pad > 8192:
        splits = 1  # the split study variant is 13-bit only
    if cap and (n_pad // window) * cap < k:
        # extraction capacity below k: the merge would cycle already-
        # emitted winners into the tail (duplicate neighbours). Small-N
        # inputs fall back to the flat packed kernel — at these sizes it
        # is cheap anyway.
        cap = 0
    # indices are discrete — no tangents flow (and pallas_call has no JVP)
    x = jax.lax.stop_gradient(x)
    q = x if queries is None else jax.lax.stop_gradient(queries)
    return _knn_pallas_jit(
        x, q, k, query_tile=query_tile, interpret=interpret, packed=packed,
        splits=splits, cap=cap, window=window, unroll_cap=unroll_cap,
        unroll_merge=unroll_merge,
    )  # idx_bits re-derived inside from the padded length


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "query_tile", "interpret", "packed", "splits", "cap", "window",
        "unroll_cap", "unroll_merge",
    ),
)
def _knn_pallas_jit(
    x: jax.Array,
    q: jax.Array,
    k: int,
    *,
    query_tile: int = 256,
    interpret: bool = False,
    packed: bool = False,
    splits: int = 1,
    cap: int = 0,
    window: int = 256,
    unroll_cap: int = 1,
    unroll_merge: int = 0,
) -> jax.Array:
    """Exact k nearest neighbours via the fused kernel.

    Args:
        x: (B, N, C) candidate point features.
        q: (B, M, C) query rows (pass ``x`` for self-kNN).
        k: neighbourhood size.
        query_tile: query rows per program (VMEM ≈ QT x N_pad x 4 bytes
            for the score tile).
        interpret: run in the Pallas interpreter (CPU tests).

    Returns:
        (B, M, k) int32 indices, nearest first, ties to the lower index.
    """
    b, n, c = x.shape
    m = q.shape[1]
    if k > n:
        raise ValueError(f"k={k} exceeds number of points {n}")
    n_pad = _round_up(n, window if cap else 128)
    idx_bits = max(13, (n_pad - 1).bit_length())
    c_pad = max(_round_up(c, 8), 8)
    k_pad = _round_up(k, 8)
    qt = min(query_tile, n_pad)
    n_q_pad = _round_up(m, qt)

    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    qp = jnp.pad(q.astype(jnp.float32),
                 ((0, 0), (0, n_q_pad - m), (0, c_pad - c)))
    if cap:
        # Stride-disperse candidate rows: original index o lands in
        # window (o mod W), so spatially-adjacent (index-adjacent) points
        # round-robin across windows. inv_col packs the original index
        # (reversed, for lax.top_k tie order) into each permuted row.
        n_win = n_pad // window
        p_idx = jnp.arange(n_pad)
        o_of_p = (p_idx % window) * n_win + p_idx // window
        xp = jnp.take(xp, o_of_p, axis=1)
        inv_col = (jnp.int32(n_pad - 1) - o_of_p.astype(jnp.int32))[
            None, :, None
        ]
        orig_col = o_of_p
    else:
        orig_col = jnp.arange(n_pad)
    cnorm = jnp.sum(xp * xp, axis=-1)  # (B, N_pad)
    cnorm = jnp.where(orig_col[None, :] >= n, jnp.inf, cnorm)

    grid = (b, n_q_pad // qt)
    if packed and cap:
        kernel = functools.partial(
            _knn_kernel_packed_capped, k_pad=k_pad, n_pad=n_pad,
            window=window, cap=cap, k_real=k, unroll_cap=unroll_cap,
            unroll_merge=unroll_merge, idx_bits=idx_bits,
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, n_pad, c_pad), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, qt, c_pad), lambda bi, qi: (bi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, 1), lambda bi, qi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, 1), lambda bi, qi: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, k_pad, qt), lambda bi, qi: (bi, 0, qi),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, k_pad, n_q_pad), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((n_pad // window, window, qt), jnp.int32),
                pltpu.VMEM((n_pad // window, cap, qt), jnp.int32),
            ],
            # The resident score tile plus pipelined input blocks overflow
            # Mosaic's default 16 MiB scoped-VMEM window at production
            # shapes; v5e has 128 MiB VMEM per core.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20,
            ),
            interpret=interpret,
        )(xp, qp, cnorm[:, :, None], inv_col)
        return jnp.swapaxes(out, 1, 2)[:, :m, :k]
    if packed and splits > 1 and n_pad % splits == 0:
        kernel = functools.partial(
            _knn_kernel_packed_split, k_pad=k_pad, n_pad=n_pad,
            splits=splits, k_real=k,
        )
        idx_scr_cols = splits * k_pad
    else:
        kernel = functools.partial(
            _knn_kernel_packed if packed else _knn_kernel,
            k_pad=k_pad, n_pad=n_pad, k_real=k,
            **({"idx_bits": idx_bits} if packed else {}),
        )
        idx_scr_cols = k_pad
    scratch_dtype = jnp.int32 if packed else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, c_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, c_pad), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, k_pad), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_q_pad, k_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((qt, n_pad), scratch_dtype),
            pltpu.VMEM((qt, idx_scr_cols), jnp.int32),
        ],
        # the resident score tile + pipelined (N_pad, C) input blocks can
        # exceed Mosaic's default scoped-VMEM window at production shapes
        # (observed at qt=384, C=64 alongside the fused stage kernels);
        # v5e has 128 MiB VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(xp, qp, cnorm[:, None, :])
    return out[:, :m, :k]


# ------------------------------------------------------------- banded kNN
def _band_starts(n_q_pad: int, qt: int, n_pad: int, band: int):
    """128-aligned band start row per query tile (static)."""
    starts = []
    for i in range(n_q_pad // qt):
        raw = i * qt + qt // 2 - band // 2
        raw = (raw // 128) * 128   # keep the dynamic VMEM slice aligned
        starts.append(int(np.clip(raw, 0, n_pad - band)))
    return starts


def knn_pallas_banded(
    x: jax.Array,
    k: int,
    *,
    band: int = 3072,
    n_win: int = 32,
    cap: int = 8,
    capped_cap: "int | None" = None,
    repair_budget: int = 256,
    query_tile: int | None = None,
    unroll_cap: int = 0,
    unroll_merge: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Stage-1 (spatial) kNN exploiting x-sorted row order.

    Scores only a contiguous ``band`` of rows around each query tile
    (sorted order ⇒ rows outside the band are at squared distance
    >= (x_q - x_edge)^2), certifies every query against that bound using
    the kernel's k-th winner key, and re-solves the rare failures
    (sparse regions) f32-EXACTLY with the queries variant of the flat
    kernel. Self-guarding fallbacks to the full capped kernel: unsorted
    input (the bound needs sorted x), more failures than
    ``repair_budget`` in any batch element, or inputs too small to band.

    Semantics: certified rows carry the capped-kernel approximation
    class (19-bit packed keys here vs the full kernel's 18-bit; in-band
    window-cap overflow is a deep Poisson tail at lambda = k/n_win
    ~ 0.94); failed rows are f32-exact. Certificate feasibility measured
    on realistic ALS tiles: 99.915% certified at band=3072 (0 failures
    on uniform 30 m bench blocks). Replaces the reference's full
    (B, N, N) scoring (/root/reference/model.py:25-40) for the spatial
    stage only — feature-space stages (2-3) measured too de-localised to
    band (x2 neighbour recall 0.996 at band=3072).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = x.shape
    if k > n:
        raise ValueError(f"k={k} exceeds number of points {n}")
    if band % 256 or band % n_win:
        raise ValueError("band must be a multiple of 256 and of n_win")
    if n_win * cap < k:
        raise ValueError(
            f"extraction capacity n_win*cap={n_win * cap} < k={k}")
    n_pad = _round_up(n, 128)
    if n_pad <= band or band - (n_pad - n) < k:
        # nothing to band (or too few real rows per band): the flat
        # capped kernel is the right tool at these sizes
        return knn_pallas(x, k, packed=True,
                          cap=cap if capped_cap is None else capped_cap,
                          unroll_cap=min(unroll_cap, 1),
                          unroll_merge=unroll_merge, interpret=interpret)
    if query_tile is None:
        # the banded score tile is (qt, band) — small enough that a wider
        # query tile than the full kernel's table entry wins (measured
        # band=2048: qt 256/384/512 -> 6.09/5.88/5.71 ms; band=3072: 384
        # best — scripts/exp_banded_knn.py)
        query_tile = (512 if band <= 2048
                      else _default_query_tile(True))
    qt = min(query_tile, band)
    x = jax.lax.stop_gradient(x)

    x0 = x[..., 0].astype(jnp.float32)
    sorted_ok = jnp.all(x0[:, 1:] >= x0[:, :-1])

    def _capped(_):
        return knn_pallas(x, k, packed=True,
                          cap=cap if capped_cap is None else capped_cap,
                          unroll_cap=min(unroll_cap, 1),
                          unroll_merge=unroll_merge, interpret=interpret)

    def _banded(_):
        idx, keys = _knn_banded_jit(
            x, k, band=band, n_win=n_win, cap=cap, query_tile=qt,
            unroll_cap=unroll_cap, unroll_merge=unroll_merge,
            interpret=interpret, hi_prec=True,
        )
        idx_bits = (band - 1).bit_length()
        imask = jnp.int32((1 << idx_bits) - 1)
        n_q_pad = _round_up(n, qt)
        starts = _band_starts(n_q_pad, qt, n_pad, band)
        s_arr = jnp.asarray(starts, jnp.int32)           # (nq,)
        s_q = jnp.repeat(s_arr, qt)[:n]                  # (n,)
        lo_i = jnp.clip(s_arr - 1, 0, n - 1)
        hi_i = jnp.clip(s_arr + band, 0, n - 1)
        xlo = jnp.repeat(jnp.take(x0, lo_i, axis=1), qt, axis=1)[:, :n]
        xhi = jnp.repeat(jnp.take(x0, hi_i, axis=1), qt, axis=1)[:, :n]
        inf = jnp.float32(jnp.inf)
        bound_lo = jnp.where(s_q > 0, (x0 - xlo) ** 2, inf)
        bound_hi = jnp.where(s_q + band < n, (xhi - x0) ** 2, inf)
        s_edge = -jnp.minimum(bound_lo, bound_hi)        # (B, n) f32
        bits = jax.lax.bitcast_convert_type(s_edge, jnp.int32)
        key_edge = jnp.where(
            bits >= 0, bits, jnp.int32(-0x80000000) - bits
        ) >> 1
        # floor-quantized compare with a one-quantum margin: implies the
        # true k-th score strictly exceeds the edge bound (conservative —
        # quantization can only ADD repairs, never hide one)
        cert = (keys & ~imask) >= (
            (key_edge & ~imask) + jnp.int32(1 << idx_bits)
        )
        fail = ~cert                                     # (B, n) bool
        counts = jnp.sum(fail, axis=1)
        r_budget = min(repair_budget, n)

        def _no_fail(_):
            return idx

        def _do_repair(_):
            # top_k over the fail flags + an exact queries-kNN are ~1 ms
            # of glue per call; on realistic tiles most calls certify
            # every query, so this whole branch is runtime-skipped
            # (repair is an identity when nothing failed, so the cond is
            # bit-exact — scripts/exp_knn_floor3.py measured the saving)
            vals, pos = jax.lax.top_k(fail.astype(jnp.int32), r_budget)
            qf = jnp.take_along_axis(x, pos[..., None], axis=1)  # (B,R,C)
            rep = knn_pallas(x, k, packed=False, interpret=interpret,
                             queries=qf)                 # f32-exact
            cur = jnp.take_along_axis(idx, pos[..., None], axis=1)
            new = jnp.where(vals[..., None] > 0, rep, cur)
            bi = jnp.arange(b)[:, None]
            return idx.at[bi, pos].set(new)

        repaired = jax.lax.cond(jnp.any(fail), _do_repair, _no_fail, None)
        return jax.lax.cond(
            jnp.all(counts <= r_budget), lambda _: repaired, _capped, None
        )

    return jax.lax.cond(sorted_ok, _banded, _capped, None)


def _feature_band_recall_warn(recall):
    import sys

    print(
        f"[dgcnn_tpu] feature-band recall guard tripped: sampled recall "
        f"{float(recall):.4f} below threshold — this batch fell back to "
        "the full capped kNN kernel (feature ordering decorrelated from "
        "the x-sort; see knn_pallas_feature_banded)",
        file=sys.stderr,
    )


def _recall_warn_ok(interpret: bool) -> bool:
    """Whether the guard may embed a jax.debug.callback warning.

    The tunnelled axon PJRT backend (single-chip dev rig) does NOT
    support host send/recv callbacks — one debug.callback in the graph
    fails the whole forward at runtime (UNIMPLEMENTED). The fallback
    itself (the actual protection) never needs the callback; the warning
    is interpret-mode/CPU default, DGCNN_RECALL_WARN=1/0 overrides.
    """
    import os

    v = os.environ.get("DGCNN_RECALL_WARN")
    if v is not None:
        on = v.strip().lower() in ("1", "true", "yes", "on")
        off = v.strip().lower() in ("0", "false", "no", "off", "")
        if not (on or off):
            raise ValueError(
                f"DGCNN_RECALL_WARN={v!r}: use 1/true/yes/on or "
                "0/false/no/off")
        return on
    return interpret or jax.default_backend() != "tpu"


def knn_pallas_feature_banded(
    x: jax.Array,
    k: int,
    *,
    sorted_ok: jax.Array,
    band: int = 4096,
    n_win: int = 32,
    cap: int = 8,
    capped_cap: "int | None" = None,
    query_tile: int | None = None,
    unroll_cap: int = 0,
    unroll_merge: int = 0,
    recall_guard: int = 256,
    recall_threshold: float = 0.995,
    guard_ok: jax.Array | None = None,
    with_flag: bool = False,
    interpret: bool | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """FEATURE-space kNN over spatially-ordered rows, banded UNcertified.

    Stage-2/3 of DGCNN re-compute kNN in learned feature space
    (/root/reference/model.py:116-130 calls get_graph_feature on x1/x2).
    Point features are spatially smooth, so when the block rows are
    x-sorted (the production order, data/dataset.py::sort_points), a
    query's feature-space neighbours overwhelmingly sit nearby in ROW
    order: measured on the trained soak model's real rooms, in-band
    recall of true x1-space neighbours at band=4096 is 0.99997 — BELOW
    the capped kernel's own Poisson cap-overflow loss (~5e-5/query)
    (scripts/exp_feature_band_offline.py). The banded kernel then scores
    only ``band`` rows per query tile: ~n_pad/band-fold less matmul and
    extraction work than the full capped kernel.

    No sound certificate exists for feature distances under a spatial
    key (measured: a spatial-edge "certificate" misses real neighbours),
    so unlike the stage-1 :func:`knn_pallas_banded` there is NO repair
    pass — this is the same evidence class as the capped kernel itself
    (heuristic, quality-bounded by trained-model agreement).

    ``sorted_ok``: traced scalar bool — whether the underlying POINTS
    are x-sorted (the caller computes it from the coordinates; it cannot
    be derived from the feature table). False falls back to the full
    capped kernel at runtime.

    Runtime RECALL guard (the self-defence the sortedness gate cannot
    provide): ``recall_guard`` strided probe queries are re-solved with
    the full capped kernel's ``queries`` variant each call, and the
    sampled recall of those reference neighbours inside the banded
    result gates a ``lax.cond`` fallback to the full capped kernel (plus
    a host-side warning via ``jax.debug.callback`` where the backend
    supports host callbacks — see :func:`_recall_warn_ok`). On geometry
    where
    x-order does NOT localise the feature graph (e.g. vertically-
    dominant scenes) quality no longer degrades silently — the batch
    pays the full-kernel cost instead. ``recall_guard=0`` disables.

    AMORTIZED guarding: ``guard_ok`` (a traced bool scalar) gates the
    probe work at runtime — False skips every probe kernel via
    ``lax.cond`` and keeps the banded result, so a host dispatch loop
    can pay the guard on every Nth call only (the sticky-fallback
    protocol lives in the step builders, train/steps.py). ``None``
    (default) guards unconditionally — the graph is unchanged from the
    per-batch-guard form. ``with_flag=True`` returns ``(idx, tripped)``
    where ``tripped`` is True iff the guard MEASURED recall below the
    threshold and the fallback was taken (the unsorted-input fallback
    is NOT a trip: banding was never engaged); hosts use it to stop
    trusting the band for subsequent unguarded dispatches.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = x.shape
    if k > n:
        raise ValueError(f"k={k} exceeds number of points {n}")
    if band % 256 or band % n_win:
        raise ValueError("band must be a multiple of 256 and of n_win")
    if n_win * cap < k:
        raise ValueError(
            f"extraction capacity n_win*cap={n_win * cap} < k={k}")
    n_pad = _round_up(n, 128)
    no_trip = jnp.zeros((), jnp.bool_)
    if n_pad <= band or band - (n_pad - n) < k:
        idx = knn_pallas(x, k, packed=True,
                         cap=cap if capped_cap is None else capped_cap,
                         unroll_cap=min(unroll_cap, 1),
                         unroll_merge=unroll_merge, interpret=interpret)
        return (idx, no_trip) if with_flag else idx
    if query_tile is None:
        query_tile = (512 if band <= 2048 else _default_query_tile(True))
    qt = min(query_tile, band)
    x = jax.lax.stop_gradient(x)

    def _capped_idx():
        return knn_pallas(x, k, packed=True,
                          cap=cap if capped_cap is None else capped_cap,
                          unroll_cap=min(unroll_cap, 1),
                          unroll_merge=unroll_merge, interpret=interpret)

    def _capped(_):
        return _capped_idx(), no_trip

    def _banded(_):
        idx, _keys = _knn_banded_jit(
            x, k, band=band, n_win=n_win, cap=cap, query_tile=qt,
            unroll_cap=unroll_cap, unroll_merge=unroll_merge,
            interpret=interpret, hi_prec=True,
        )
        if not recall_guard:
            return idx, no_trip
        s = min(recall_guard, n)

        def _probe_recall(s_probe: int, probe_qt: "int | None"):
            # static strided probe rows (deterministic — no RNG in graph)
            pos = jnp.asarray(
                np.linspace(0, n - 1, s_probe).round().astype(np.int32))
            qf = jnp.take(x, pos, axis=1)                # (B, S, C)
            ref = knn_pallas(
                x, k, packed=True,
                cap=cap if capped_cap is None else capped_cap,
                query_tile=probe_qt,
                unroll_cap=min(unroll_cap, 1), unroll_merge=unroll_merge,
                interpret=interpret, queries=qf,
            )                                            # (B, S, k)
            got = jnp.take(idx, pos, axis=1)             # (B, S, k)
            hit = jnp.any(ref[..., :, None] == got[..., None, :], axis=-1)
            return jnp.mean(hit.astype(jnp.float32))

        def _keep(_):
            return idx, no_trip

        def _fall_on(recall):
            def _fall(_):
                if _recall_warn_ok(interpret):
                    jax.debug.callback(_feature_band_recall_warn, recall)
                return _capped_idx(), jnp.ones((), jnp.bool_)

            return _fall

        def _gated(probe):
            # amortized mode: skip the probe kernels entirely when the
            # host didn't ask for a guarded dispatch (recall reads as
            # perfect -> the keep branch, zero probe work executed)
            if guard_ok is None:
                return probe(None)
            return jax.lax.cond(
                guard_ok, probe, lambda _: jnp.float32(1.0), None)

        thr = jnp.float32(recall_threshold)
        s0 = min(64, s)
        if s0 >= s:
            # small guard: single-stage, at the narrow probe tile
            recall = _gated(lambda _: _probe_recall(s, 64))
            return jax.lax.cond(recall >= thr, _keep, _fall_on(recall),
                                None)
        # TWO-STAGE sequential probe (VERDICT r4 item 4): a 64-probe
        # first stage at a 64-row query tile costs ~s0/s of the old
        # single-stage guard (the probe kernel's cost is per query tile
        # x full table width); only a first-stage recall below the
        # ESCALATION threshold — halfway between perfect and the
        # fallback threshold, i.e. stricter than the fallback decision
        # itself — pays for the full s-probe confirmation, whose recall
        # then gates the fallback exactly as before. Healthy geometry
        # (measured recall 0.99997) keeps stage A at ~1.0, so the
        # escalation is a cold branch; degraded geometry lands far
        # below both thresholds and trips stage B's fallback. The only
        # semantic change vs single-stage: a TRUE recall in the narrow
        # window (thr, escalate_thr) may keep the band without the
        # s-probe confirmation on calls where the 64-probe sample reads
        # high — above the fallback threshold by definition, so never a
        # silent quality class change.
        escalate_thr = jnp.float32(1.0 - (1.0 - recall_threshold) / 2.0)
        recall_a = _gated(lambda _: _probe_recall(s0, 64))

        def _escalate(_):
            recall_b = _probe_recall(s, None)
            return jax.lax.cond(recall_b >= thr, _keep,
                                _fall_on(recall_b), None)

        return jax.lax.cond(recall_a >= escalate_thr, _keep, _escalate,
                            None)

    idx, tripped = jax.lax.cond(sorted_ok, _banded, _capped, None)
    return (idx, tripped) if with_flag else idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "band", "n_win", "cap", "query_tile",
                     "unroll_cap", "unroll_merge", "interpret", "study",
                     "hi_prec"),
)
def _knn_banded_jit(
    x: jax.Array,
    k: int,
    *,
    band: int,
    n_win: int,
    cap: int,
    query_tile: int,
    unroll_cap: int = 0,
    unroll_merge: int = 0,
    interpret: bool = False,
    study: str | None = None,
    hi_prec: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Raw banded kernel: ((B, N, k) indices, (B, N) k-th packed keys).

    ``study`` (ablation instrumentation, scripts/exp_knn_floor.py) trades
    correctness for a phase-isolated timing: "score_only" stops after the
    distance matmul + epilogue, "no_extract" after packing + scratch
    store, "no_mm" replaces the matmul with a broadcast, "bf16_mm" feeds
    the dot bf16 operands. Outputs are JUNK for every value except None.
    """
    b, n, c = x.shape
    n_pad = _round_up(n, 128)
    c_pad = max(_round_up(c, 8), 8)
    k_pad = _round_up(k, 8)
    qt = query_tile
    n_q_pad = _round_up(n, qt)
    idx_bits = (band - 1).bit_length()

    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    qp = jnp.pad(xf, ((0, 0), (0, n_q_pad - n), (0, c_pad - c)))
    cnorm = jnp.sum(xp * xp, axis=-1)                    # (B, N_pad)
    cnorm = jnp.where(jnp.arange(n_pad)[None, :] >= n, jnp.inf, cnorm)
    starts = jnp.asarray(
        _band_starts(n_q_pad, qt, n_pad, band), jnp.int32
    ).reshape(-1, 1, 1)                                  # (nq, 1, 1)

    kernel = functools.partial(
        _knn_kernel_banded, band=band, n_win=n_win, cap=cap, k_pad=k_pad,
        n_pad=n_pad, k_real=k, idx_bits=idx_bits, unroll_cap=unroll_cap,
        unroll_merge=unroll_merge, study=study, hi_prec=hi_prec,
    )
    nq = n_q_pad // qt
    idx_out, key_out = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi, qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, c_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, c_pad), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, qt), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, n_q_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n_q_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((band // n_win, n_win, qt), jnp.int32),
            pltpu.VMEM((cap, n_win, qt), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(starts, xp, qp, cnorm[:, :, None])
    idx = jnp.swapaxes(idx_out, 1, 2)[:, :n, :k]
    return idx, key_out[:, 0, :n]


# --------------------------------------------------------- f32-exact banded
@functools.partial(
    jax.jit,
    static_argnames=("k", "band", "n_win", "cap", "query_tile",
                     "unroll_cap", "unroll_merge", "interpret"),
)
def _knn_exact_jit(
    x: jax.Array,
    k: int,
    *,
    band: int,
    n_win: int,
    cap: int,
    query_tile: int,
    unroll_cap: int = 0,
    unroll_merge: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Raw f32-exact banded kernel.

    Returns ``(idx (B,N,k), kth_key (B,N) int32, ovf (B,N) int32)`` —
    kth_key is the exact monotone-int transform of each query's k-th
    winner score (for the caller's band-edge certificate), ovf flags
    queries whose certification against hidden in-window candidates
    failed (see :func:`_knn_kernel_exact_banded`).
    """
    b, n, c = x.shape
    n_pad = _round_up(n, 128)
    c_pad = max(_round_up(c, 8), 8)
    k_pad = _round_up(k, 8)
    qt = query_tile
    n_q_pad = _round_up(n, qt)

    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    qp = jnp.pad(xf, ((0, 0), (0, n_q_pad - n), (0, c_pad - c)))
    cnorm = jnp.sum(xp * xp, axis=-1)                    # (B, N_pad)
    cnorm = jnp.where(jnp.arange(n_pad)[None, :] >= n, jnp.inf, cnorm)
    starts = jnp.asarray(
        _band_starts(n_q_pad, qt, n_pad, band), jnp.int32
    ).reshape(-1, 1, 1)

    kernel = functools.partial(
        _knn_kernel_exact_banded, band=band, n_win=n_win, cap=cap,
        k_pad=k_pad, k_real=k, unroll_cap=unroll_cap,
        unroll_merge=unroll_merge,
    )
    nq = n_q_pad // qt
    idx_out, kth_out, ovf_out = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi, qi: (qi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, c_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qt, c_pad), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 1), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, qt), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k_pad, n_q_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n_q_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, n_q_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((band // n_win, n_win, qt), jnp.int32),
            pltpu.VMEM((cap, n_win, qt), jnp.int32),
            pltpu.VMEM((cap, n_win, qt), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(starts, xp, qp, cnorm[:, :, None])
    idx = jnp.swapaxes(idx_out, 1, 2)[:, :n, :k]
    return idx, kth_out[:, 0, :n], ovf_out[:, 0, :n]


def _key_to_f32(key: jax.Array) -> jax.Array:
    """Invert the monotone int32 key transform back to the f32 score
    (the transform is an involution on the int32 bit pattern)."""
    bits = jnp.where(key >= 0, key, jnp.int32(-0x80000000) - key)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def knn_pallas_exact(
    x: jax.Array,
    k: int,
    *,
    band: int = 2048,
    n_win: int = 64,
    cap: int = 8,
    repair_budget: int = 256,
    query_tile: int | None = None,
    unroll_cap: int = 0,
    unroll_merge: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Bit-exact kNN at capped-extraction speed (the parity-mode kernel).

    Indices are IDENTICAL to ``lax.top_k`` over the reference scores
    ``2 q.c - |c|^2`` (/root/reference/model.py:25-40 semantics, ties to
    the lower index) on every input — the speed of the capped/banded
    machinery with none of its approximation:

    * On x-SORTED inputs (the production block order) each query tile
      scores only a ``band``-row window (like :func:`knn_pallas_banded`)
      and every query is certified against the sorted-order band-edge
      distance bound in f32, with an fp-error margin ~2^-13 of the data's
      norm scale (vs actual MXU/dot error <~2^-20 — conservative: a too-
      tight margin could hide a true out-of-band neighbour, a loose one
      only adds repairs).
    * On ANY input (sorted or not) the per-window top-``cap`` extraction
      is certified against hidden in-window candidates by the kernel
      itself (a window whose cap-th winner ties-or-beats the global k-th
      may hide better rows — see :func:`_knn_kernel_exact_banded`).
    * Queries failing either certificate are re-solved with the f32-exact
      flat kernel (the ``queries`` variant); more than ``repair_budget``
      failures in any batch element falls back to the full flat kernel.
      Every path is exact, so the result is exact unconditionally.

    Unsorted inputs skip the banding (no sorted-order bound exists) and
    run the same kernel at full width — the window-overflow certificate
    needs no ordering. ``band=0`` forces full width (feature-space
    stages 2-3 use this: no sound feature-distance band bound exists).

    Exactness caveat (score computation, not selection): selection and
    tie order are bit-identical to ``lax.top_k`` over THIS kernel's f32
    scores unconditionally, and the distance dot runs at
    ``Precision.HIGHEST`` (the TPU DEFAULT truncates f32 operands to
    bf16 — 4.3e-3 rel score error, which flipped real rankings;
    scripts/exp_dot_precision_probe.py). What remains is cross-program
    f32 accumulation-order noise vs the XLA einsum: measured on TPU at
    the production shape (B=8, N=7000, k=30), 104 of 1.68M index
    entries differ from ops/knn.py's top_k, every one an exact near-tie
    (f64 rel gap <= 2.5e-7 ~ 1-2 f32 ulp — scripts/
    exp_exact_knn_diag.py); wherever the dot is fp-exact (grid-quantized
    coords, the CPU test construction) agreement is bitwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, c = x.shape
    if k > n:
        raise ValueError(f"k={k} exceeds number of points {n}")
    if band and (band % 128 or band % n_win):
        raise ValueError("band must be a multiple of 128 and of n_win")
    if n_win * cap < k:
        raise ValueError(
            f"extraction capacity n_win*cap={n_win * cap} < k={k}")
    n_pad = _round_up(n, 128)
    x = jax.lax.stop_gradient(x)

    def _flat(_=None):
        return knn_pallas(x, k, packed=False, interpret=interpret)

    # full-width band: the whole padded table as one band (the reshape
    # round-robins rows across windows; no certificate against out-of-
    # band rows is needed because there are none)
    full_band = n_pad
    if full_band % n_win or (full_band // n_win) * cap < k or n < 2 * k:
        # too small to window — the flat kernel is cheap there anyway
        return _flat()
    vmem_budget = _vmem_budget_bytes()
    if query_tile is None:
        query_tile = 512 if max(band, 1) <= 2048 else 256
    qt = query_tile
    scr_bytes = (full_band + 2 * cap * n_win) * 4
    while qt > 64 and qt * scr_bytes > vmem_budget:
        qt //= 2
    if qt * scr_bytes > vmem_budget:
        from dgcnn_tpu.ops.knn import knn as knn_xla

        return knn_xla(x, k, query_chunk=1024)
    qt = min(qt, n_pad)

    banded_ok = (band and n_pad > band
                 and band - (n_pad - n) >= k)
    if banded_ok:
        # A query tile wider than the band would put tile-edge queries
        # outside their own band: the edge certificate then fails them
        # all, the repair budget overflows, and every call silently runs
        # the flat fallback ON TOP of the banded pass. Clamp like
        # knn_pallas_banded does.
        qt = min(qt, band)
    x0 = x[..., 0].astype(jnp.float32)

    def _repair(idx, fail, counts):
        """Re-solve failed queries f32-exactly; over-budget batch elems
        fall back to the flat exact kernel wholesale."""
        r_budget = min(repair_budget, n)

        def _within_budget(_):
            def _no_fail(_):
                return idx

            def _do_repair(_):
                vals, pos = jax.lax.top_k(fail.astype(jnp.int32), r_budget)
                qf = jnp.take_along_axis(x, pos[..., None], axis=1)
                rep = knn_pallas(x, k, packed=False, interpret=interpret,
                                 queries=qf)
                cur = jnp.take_along_axis(idx, pos[..., None], axis=1)
                new = jnp.where(vals[..., None] > 0, rep, cur)
                bi = jnp.arange(b)[:, None]
                return idx.at[bi, pos].set(new)

            return jax.lax.cond(jnp.any(fail), _do_repair, _no_fail, None)

        # nest the repair under the budget check so the top_k/gather/
        # repair kernel never executes when the flat fallback is taken
        return jax.lax.cond(
            jnp.all(counts <= r_budget), _within_budget, _flat, None)

    def _full(_):
        idx, kth, ovf = _knn_exact_jit(
            x, k, band=full_band, n_win=n_win, cap=cap, query_tile=qt,
            unroll_cap=unroll_cap, unroll_merge=unroll_merge,
            interpret=interpret,
        )
        fail = ovf > 0
        return _repair(idx, fail, jnp.sum(fail, axis=1))

    if not banded_ok:
        return _full(None)

    def _banded(_):
        idx, kth, ovf = _knn_exact_jit(
            x, k, band=band, n_win=n_win, cap=cap, query_tile=qt,
            unroll_cap=unroll_cap, unroll_merge=unroll_merge,
            interpret=interpret,
        )
        # band-edge certificate, in f32 score space: an out-of-band
        # candidate's computed score is <= -gap^2 + |q|^2 up to fp error
        # (scores here are 2q.c - |c|^2 = -d^2 + |q|^2 in real
        # arithmetic); require the k-th winner to beat that bound by a
        # margin covering the dot's fp error (default TPU f32 matmul
        # error <~2^-20 relative to the norm scale; margin 2^-13)
        n_q_pad = _round_up(n, qt)
        starts = _band_starts(n_q_pad, qt, n_pad, band)
        s_arr = jnp.asarray(starts, jnp.int32)
        s_q = jnp.repeat(s_arr, qt)[:n]
        lo_i = jnp.clip(s_arr - 1, 0, n - 1)
        hi_i = jnp.clip(s_arr + band, 0, n - 1)
        xlo = jnp.repeat(jnp.take(x0, lo_i, axis=1), qt, axis=1)[:, :n]
        xhi = jnp.repeat(jnp.take(x0, hi_i, axis=1), qt, axis=1)[:, :n]
        inf = jnp.float32(jnp.inf)
        bound_lo = jnp.where(s_q > 0, (x0 - xlo) ** 2, inf)
        bound_hi = jnp.where(s_q + band < n, (xhi - x0) ** 2, inf)
        gap2 = jnp.minimum(bound_lo, bound_hi)           # (B, n)
        qnorm = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1)  # (B, n)
        cn_max = jnp.max(qnorm, axis=1, keepdims=True)
        margin = (cn_max + qnorm) * jnp.float32(2.0 ** -13)
        s_kth = _key_to_f32(kth)
        cert = s_kth > (-gap2 + qnorm + margin)
        fail = (ovf > 0) | ~cert
        return _repair(idx, fail, jnp.sum(fail, axis=1))

    sorted_ok = jnp.all(x0[:, 1:] >= x0[:, :-1])
    return jax.lax.cond(sorted_ok, _banded, _full, None)
