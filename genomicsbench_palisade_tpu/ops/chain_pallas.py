"""Pallas TPU kernel for batched minimap2 anchor chaining.

The vmapped XLA scan (ops/chain.py chain_dp_device_batch) pays the
~25 us/step device-loop floor per anchor step; this kernel walks all
anchors of a 128-call lane tile inside one pallas_call (Mosaic loop
steps are sub-microsecond), with the sequential state (scores/parents/
peaks) resident in VMEM and everything else computed in-register.

Key reformulations vs the scan (bit-exact, tested):
  * the window is the SUBLANE axis; x/q windows are dynamic slices of
    VMEM-resident inputs, so nothing is precomputed or streamed;
  * the per-call f64-exact gap table (host-built, chain.prepare_call)
    becomes a per-call FIXED-POINT SLOPE: gap(dd) = gap0 + ((dd*m)>>20)
    + (ilog2(dd)>>1), host-verified exact over dd in [0, bw] — one mult
    + shift instead of a per-element gather (XLA's gather measured
    ~330 ms for the same lookups).  Calls with no exact slope (rare
    double-rounding edge cases, e.g. avg_qspan an exact quarter) are
    split out by chain.chain_calls_batched and run the XLA scan;
  * the reference's descending-j visit order becomes suffix scans
    (exclusive suffix-max, suffix-sum, suffix-min) via log2(w) masked
    roll rounds;
  * the max_skip "marked parents" scatter becomes a per-lane BITMASK:
    OR-reduce one-hot words over the window, then per-row bit tests;
  * the peak-parent lookup (per-lane dynamic index) becomes a masked
    max-reduce over the window rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain import MAX_SKIP

NEG = -(1 << 28)
LANE_TILE = 128
NC_RING = 2048  # anchor rows per ring chunk (scratch = 3x(nc+w)x128 i32)


def _suffix_scan(v, op, w, r_iota):
    """Inclusive suffix scan over the sublane (window) axis."""
    k = 1
    while k < w:
        rolled = pltpu.roll(v, w - k, axis=0)  # cyclic up-shift by k
        v = jnp.where(r_iota + k < w, op(v, rolled), v)
        k <<= 1
    return v


def _kernel(params, x_ref, q_ref, qspan_ref, st_ref, steps_ref, gap0_ref,
            out_sc_ref, out_par_ref, out_pk_ref, sc_ref, par_ref, pk_ref):
    """Anchor axis is processed in CHUNKS of nc rows per grid step with a
    w-row ring carry: the sequential state scratch holds only [nc+w]
    rows, so VMEM no longer bounds the call size (the reference's calls
    reach ~87k anchors; the old whole-call scratch capped at 8192).

    per_anchor mode (lane packing): the qspan input instead carries a
    PER-ANCHOR packed word (slope << 8 | qspan; slope < 2^22 verified by
    gap_fixed_point, qspan <= 255 by construction) so one lane can hold
    several calls concatenated along the anchor axis — the per-anchor
    st_eff already fences each call's predecessor window at its start,
    so no other state is per-call.  steps_ref is unused in this mode
    (one packed array ships instead of two: the relay moves ~80 MB/s,
    so input bytes are the dataset-scale bottleneck, not FLOPs)."""
    w, nc, n_pad, max_dist_x, max_dist_y, bw, per_anchor = params
    bt = qspan_ref.shape[1]
    j = pl.program_id(1)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (w, bt), 0)
    m_fp = None if per_anchor else steps_ref[0:1, :]  # [1, bt] slope (<<20)
    gap0 = gap0_ref[0:1, :]  # [1, bt]

    @pl.when(j == 0)
    def _init():
        sc_ref[:] = jnp.zeros((nc + w, bt), jnp.int32)
        par_ref[:] = jnp.full((nc + w, bt), -1, jnp.int32)
        pk_ref[:] = jnp.zeros((nc + w, bt), jnp.int32)

    n_words = (w + 31) // 32
    n_log = max(int(np.floor(np.log2(max(bw, 2)))), 1)

    def body(t, _):
        i = j * nc + t  # absolute anchor index within this call tile
        if per_anchor:
            word = qspan_ref[pl.ds(t, 1), :]  # [1, bt] (m << 8 | qspan)
            qspan_i = word & 0xFF
            m_row = jax.lax.shift_right_logical(word, 8)
        else:
            qspan_i = qspan_ref[pl.ds(t, 1), :]  # [1, bt]
            m_row = m_fp
        st_i = st_ref[pl.ds(t, 1), :]
        x_i = x_ref[pl.ds(t + w, 1), :]
        q_i = q_ref[pl.ds(t + w, 1), :]
        x_win = x_ref[pl.ds(t, w)]
        q_win = q_ref[pl.ds(t, w)]

        sc_win = sc_ref[pl.ds(t, w)]
        par_win = par_ref[pl.ds(t, w)]
        pk_win = pk_ref[pl.ds(t, w)]

        # dr in u32 wraparound of the x low words (exact within the window)
        dr = (x_i.astype(jnp.uint32) - x_win.astype(jnp.uint32)).astype(jnp.int32)
        dq = q_i - q_win
        dd = jnp.abs(dr - dq)
        j_abs = i - w + r_iota
        eligible = (
            (j_abs >= st_i) & (j_abs >= 0) & (dr != 0) & (dq > 0)
            & (dq <= max_dist_y) & (dq <= max_dist_x) & (dd <= bw)
        )

        # gap(dd) = gap0 + ((dd*m) >> 20) + (ilog2(dd) >> 1): the host
        # verified the fixed-point slope reproduces the f64-exact table
        # for every dd in [0, bw] (gap_fixed_point), so this matches the
        # old 256-threshold unroll bit-for-bit at ~5% of its vector ops.
        # Overflow for dd > bw is unmasked garbage, but those rows fail
        # `eligible` and never contribute.
        lin = jax.lax.shift_right_logical(dd * m_row, 20)
        ilog = jnp.zeros((w, bt), jnp.int32)
        for k in range(1, n_log + 1):
            ilog = ilog + (dd >= (1 << k)).astype(jnp.int32)
        gap = gap0 + lin + jax.lax.shift_right_logical(ilog, 1)

        min_d = jnp.minimum(jnp.minimum(dq, dr), qspan_i)
        sc = jnp.where(eligible, min_d - gap + sc_win, NEG)

        # exclusive suffix max over higher rows (later-visited anchors)
        suff_inc = _suffix_scan(sc, jnp.maximum, w, r_iota)
        suff_exc = jnp.where(r_iota + 1 < w,
                             pltpu.roll(suff_inc, w - 1, axis=0), NEG)
        rm = jnp.maximum(suff_exc, qspan_i)
        improve = (sc > rm) & eligible

        # marked-parent bitmask: mark_pos in [0, w) for in-window parents
        mark_pos = par_win - (i - w)
        do_mark = eligible & (par_win >= 0) & (mark_pos >= 0)
        chunks = []
        for word in range(n_words):
            bit = jnp.where(
                do_mark & ((mark_pos >> 5) == word),
                jnp.uint32(1) << (mark_pos & 31).astype(jnp.uint32),
                jnp.uint32(0),
            )
            k = 1
            while k < w:  # OR-reduce over rows (log tree)
                bit = bit | jnp.where(
                    r_iota + k < w, pltpu.roll(bit, w - k, axis=0), jnp.uint32(0))
                k <<= 1
            word_bits = bit[0:1, :]  # [1, bt]
            lo, hi = 32 * word, min(32 * (word + 1), w)
            shift = (r_iota[lo:hi] & 31).astype(jnp.uint32)
            chunks.append(((word_bits >> shift) & 1).astype(jnp.bool_))
        marked = chunks[0] if n_words == 1 else jnp.concatenate(chunks, axis=0)
        skip = eligible & ~improve & marked

        # max_skip walk in visit (descending-row) order: suffix cumsum of
        # (+1 skip / -1 improve), clamped at 0 from the start of the walk
        e = skip.astype(jnp.int32) - improve.astype(jnp.int32)
        ssum = _suffix_scan(e, lambda a, b: a + b, w, r_iota)
        smin = _suffix_scan(ssum, jnp.minimum, w, r_iota)
        c_walk = ssum - jnp.minimum(jnp.int32(0), smin)
        brk = skip & (c_walk > MAX_SKIP)
        # first break in visit order = LARGEST breaking row
        brk_r = jnp.max(jnp.where(brk, r_iota, -1), axis=0)[None, :]
        processed = r_iota > brk_r
        sc_proc = jnp.where(processed, sc, NEG)

        m = jnp.max(sc_proc, axis=0)[None, :]  # [1, bt]
        has = m > qspan_i
        # first strict improvement in visit order = LARGEST row with sc==m
        r_best = jnp.max(jnp.where(sc_proc == m, r_iota, -1), axis=0)[None, :]
        j_best = i - w + r_best
        max_f = jnp.where(has, m, qspan_i)
        max_j = jnp.where(has, j_best, -1)

        peak_parent = jnp.max(
            jnp.where(r_iota == r_best, pk_win, NEG), axis=0)[None, :]
        peak = jnp.where((max_j >= 0) & (peak_parent > max_f),
                         peak_parent, max_f)

        sc_ref[pl.ds(t + w, 1), :] = max_f
        par_ref[pl.ds(t + w, 1), :] = max_j
        pk_ref[pl.ds(t + w, 1), :] = peak
        return ()

    jax.lax.fori_loop(0, nc, body, ())

    out_sc_ref[:] = sc_ref[pl.ds(w, nc)]
    out_par_ref[:] = par_ref[pl.ds(w, nc)]
    out_pk_ref[:] = pk_ref[pl.ds(w, nc)]

    # ring carry: last w rows become the lead-in of the next chunk
    # (nc >= w so source and destination never overlap)
    sc_ref[pl.ds(0, w)] = sc_ref[pl.ds(nc, w)]
    par_ref[pl.ds(0, w)] = par_ref[pl.ds(nc, w)]
    pk_ref[pl.ds(0, w)] = pk_ref[pl.ds(nc, w)]


def gap_fixed_point(gap_tables: np.ndarray, bw: int, shift: int = 20):
    """Exact fixed-point form of the per-call gap tables.

    gap_table[dd] = table[0] + floor(dd*c) + (ilog2(dd) >> 1) with
    c = 0.01*avg_qspan (prepare_call); find integer m with
    floor(dd*c) == (dd*m) >> shift for ALL dd in [0, bw] (host-verified
    exactly, so the kernel's 1 mult + 1 shift replaces the table).
    Returns (m [B] i32, gap0 [B] i32, ok [B] bool)."""
    b = len(gap_tables)
    dd = np.arange(bw + 1, dtype=np.int64)
    ilog = np.zeros(bw + 1, np.int64)
    ilog[1:] = np.floor(np.log2(dd[1:])).astype(np.int64)
    gap0 = gap_tables[:, 0].astype(np.int64)
    ms = np.zeros(b, np.int32)
    ok = np.zeros(b, bool)
    for bi in range(b):
        lin = gap_tables[bi].astype(np.int64) - gap0[bi] - (ilog >> 1)
        if lin[0] != 0 or np.any(np.diff(lin) < 0):
            continue
        # exact feasibility interval: for every dd >= 1 we need
        # lin[dd] <= dd*m/2^shift < lin[dd]+1
        d = dd[1:]
        lo = int(np.max(-(-(lin[1:] << shift) // d)))          # ceil
        hi = int(np.min((((lin[1:] + 1) << shift) - 1) // d))  # floor
        m = max(lo, 0)
        if lo <= hi and m < (1 << 22) and np.all((dd * m) >> shift == lin):
            ms[bi] = m
            ok[bi] = True
    return ms, gap0.astype(np.int32), ok


@functools.partial(
    jax.jit,
    static_argnames=("w", "n_pad", "max_dist_x", "max_dist_y", "bw",
                     "lane_tile", "nc", "per_anchor"),
)
def chain_dp_pallas_batch(x_lo, qi, qspan, st_eff, steps, gap0, n,
                          w, n_pad, max_dist_x, max_dist_y, bw,
                          lane_tile: int = LANE_TILE, nc: int | None = None,
                          per_anchor: bool = False):
    """Batched chain DP, pallas path.  Same outputs as
    chain_dp_device_batch; `steps` is the per-call fixed-point gap slope
    from gap_fixed_point (1 mult + shift per cell instead of the old
    unrolled threshold compares — those were ~2/3 of per-step work).
    per_anchor (lane packing, chain.chain_calls_packed): `qspan` instead
    carries the per-anchor packed word (slope << 8 | qspan) so lanes may
    hold several calls — st_eff fences the windows; `steps` is ignored.

    The anchor axis is chunked (ring-carry kernel), so n_pad is bounded
    by HBM, not VMEM — reference-scale 87k-anchor calls run here."""
    b, _ = x_lo.shape
    if nc is None:
        # scoped-VMEM model (measured on v5e: the compiler's scoped need
        # is ~(14*nc + 7*w) rows of 512 B against a 16 MB limit): the
        # full NC_RING chunk fits for windows <= 128 rows; wider windows
        # (reference max_iter buckets up to W_CAP=512) need nc=1024 —
        # at nc=2048/w=512 the 87k-anchor dataset call OOMs by 848 KB.
        # per_anchor adds one chunked(nc) input (the slope rows), so the
        # w <= 128 case drops to nc=1024 as well to stay inside the model.
        nc = min(n_pad, NC_RING if (w <= 128 and not per_anchor) else 1024)
    assert nc >= w, (nc, w)  # ring carry must cover the window
    assert b % lane_tile == 0 and n_pad % nc == 0, (b, lane_tile, n_pad, nc)
    n_chunks = n_pad // nc

    def halo_chunks(a):
        """[B, n_pad] -> [n_chunks*(nc+w), B]: overlapping windows
        (chunk j = padded rows [j*nc, j*nc+nc+w)) so pallas blocks can
        stay non-overlapping."""
        a_pad = jnp.concatenate(
            [jnp.zeros((b, w), jnp.int32), a.astype(jnp.int32)], axis=1)
        idx = (np.arange(n_chunks)[:, None] * nc
               + np.arange(nc + w)[None, :]).reshape(-1)
        return a_pad[:, idx].T

    x_t = halo_chunks(x_lo)    # [n_chunks*(nc+w), B]
    q_t = halo_chunks(qi)
    qspan_t = qspan.astype(jnp.int32).T   # [n_pad, B]
    st_t = st_eff.astype(jnp.int32).T
    # per_anchor: slope rides inside qspan_t; steps is a dead [B] input
    m_t = steps.astype(jnp.int32)[None, :]    # [1, B] per-call slope
    gap0_t = gap0.astype(jnp.int32)[None, :]  # [1, B]

    grid = (b // lane_tile, n_chunks)

    def col(rows):
        return pl.BlockSpec((rows, lane_tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    def chunked(rows):
        return pl.BlockSpec((rows, lane_tile), lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((n_pad, b), jnp.int32)] * 3
    scores, parents, peaks = pl.pallas_call(
        functools.partial(_kernel, (w, nc, n_pad, max_dist_x, max_dist_y, bw,
                                    per_anchor)),
        grid=grid,
        in_specs=[chunked(nc + w), chunked(nc + w), chunked(nc), chunked(nc),
                  col(1), col(1)],
        out_specs=[chunked(nc)] * 3,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nc + w, lane_tile), jnp.int32),  # scores ring
            pltpu.VMEM((nc + w, lane_tile), jnp.int32),  # parents ring
            pltpu.VMEM((nc + w, lane_tile), jnp.int32),  # peaks ring
        ],
        cost_estimate=pl.CostEstimate(
            flops=300 * b * n_pad * w, bytes_accessed=b * n_pad * 16,
            transcendentals=0,
        ),
    )(x_t, q_t, qspan_t, st_t, m_t, gap0_t)
    return scores.T, parents.T, peaks.T
