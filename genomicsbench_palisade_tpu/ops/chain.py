"""minimap2 anchor-chaining DP on TPU (mm_chain_dp semantics, n_segs==1).

TPU-native design.  The reference scans predecessors j=i-1..st sequentially
per anchor with data-dependent breaks (host_kernel.cpp:405-472).  Here each
anchor step is ONE vectorized pass over a fixed predecessor window [W]:

  * window start st is a pure function of the (sorted) anchor x positions,
    precomputed exactly on the host; inside the window dr = x[i]-x[j] is
    guaranteed <= max_dist_x, so the whole DP is int32 (no u64 on device)
  * gap_cost = (int)(dd*.01*avg_qspan) + (ilog2(dd)>>1) is a host-built
    exact float64 lookup table over dd in [0, bw] — bit-identical to the
    reference's double arithmetic
  * the max_skip break: n_skip is a 0-clamped +/-1 walk over the descending
    visit order, so n_skip_t = S_t - min(0, min_{u<=t} S_u) (prefix-sum
    reflection); the break is the first skip event whose walk value exceeds
    max_skip.  Skip events need the "targets[j]==i" marks, which are a
    scatter of parents[j'] over eligible window anchors j'.  Marks at any
    position j above the break can only originate from j' > j (parents
    point strictly backward), and every such j' is genuinely visited, so a
    single scatter pass reproduces the sequential semantics exactly.
  * strict-improvement tie-breaking: max_j = largest j with sc == max.

Outputs per anchor: scores, parents, peak_scores (exact integer parity
with the oracle / reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_ITER = 5000
MAX_SKIP = 25
NEG = -(1 << 30)


def prepare_call(x, y, avg_qspan, max_dist_x=5000, max_dist_y=5000, bw=500, n_segs=1):
    """Host-side exact precomputation for one call.

    x, y: uint64 anchor arrays (x must be non-decreasing — minimap2's
    chaining precondition).  Returns dict of numpy arrays + metadata.
    """
    assert n_segs == 1, "n_segs>1 falls back to the oracle"
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    n = len(x)
    assert np.all(x[1:] >= x[:-1]), "anchors must be sorted by x"

    # exact sequential st: advance while ri > x[st]+max_dist_x (monotone x
    # makes the stopping condition monotone, so searchsorted is exact)
    xp = x + np.uint64(max_dist_x)
    s = np.searchsorted(xp, x, side="left").astype(np.int64)
    st = np.minimum(np.maximum.accumulate(s), np.arange(n))
    st_eff = np.maximum(st, np.arange(n) - MAX_ITER).astype(np.int32)

    qi = x_lo_to_i32(y)  # (int32)y
    qspan = ((y >> np.uint64(32)) & np.uint64(0xFF)).astype(np.int32)
    x_lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    # exact float64 gap-cost table over dd in [0, bw]
    dd = np.arange(bw + 1, dtype=np.float64)
    c_lin = (dd * 0.01 * np.float64(np.float32(avg_qspan))).astype(np.int64)
    log_dd = np.zeros(bw + 1, dtype=np.int64)
    v = np.arange(bw + 1)
    log_dd[1:] = np.floor(np.log2(v[1:])).astype(np.int64)
    gap = c_lin + (log_dd >> 1)
    # sc -= (int)((double)gap_cost * gap_scale + .499) with gap_scale=1.0
    gap_table = (gap.astype(np.float64) * 1.0 + 0.499).astype(np.int64).astype(np.int32)

    w_need = int(np.max(np.arange(n) - st_eff)) if n else 0
    return {
        "n": n,
        "x_lo": x_lo,
        "qi": qi,
        "qspan": qspan,
        "st_eff": st_eff,
        "gap_table": gap_table.astype(np.int32),
        "max_dist_x": max_dist_x,
        "max_dist_y": max_dist_y,
        "bw": bw,
        "w_need": w_need,
    }


def x_lo_to_i32(y):
    return (y & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)


def _chain_dp_core(x_lo, qi, qspan, st_eff, gap_table, n, w, n_pad,
                   max_dist_x, max_dist_y, bw, halo=None, offset=0):
    """Windowed chain DP.  All int32.  Arrays padded to n_pad.

    Returns (scores, parents, peaks) of length n_pad (valid through n).

    halo (optional): dict with x_lo/qi/scores/parents/peaks [w] arrays —
    the trailing window of the PRECEDING shard when the anchor axis is
    sharded (parallel.dp.chain_dp_halo_sharded); offset is this shard's
    global anchor offset (anchor indices in st_eff/parents are global).
    """
    # pad W leading dummies so the window slice at anchor i starts at i
    def pad_front(a, fill=0, lead=None):
        if lead is None:
            lead = jnp.full((w,), fill, a.dtype)
        return jnp.concatenate([lead.astype(a.dtype), a])

    halo = halo or {}
    x_lo_p = pad_front(x_lo.view(jnp.int32) if hasattr(x_lo, "view") else x_lo,
                       lead=halo.get("x_lo"))
    qi_p = pad_front(qi, lead=halo.get("qi"))
    j_rel = jnp.arange(w, dtype=jnp.int32)  # ascending within the window

    state = dict(
        scores=pad_front(jnp.zeros(n_pad, jnp.int32), lead=halo.get("scores")),
        parents=pad_front(jnp.full(n_pad, -1, jnp.int32), -1,
                          lead=halo.get("parents")),
        peaks=pad_front(jnp.zeros(n_pad, jnp.int32), lead=halo.get("peaks")),
    )

    def step(st, i):
        base = i  # window = padded indices [i, i+w) = absolute [i-w, i)
        x_lo_i = x_lo_p[i + w]
        qi_i = qi_p[i + w]
        qspan_i = qspan[i]
        st_i = st_eff[i]

        x_lo_win = jax.lax.dynamic_slice(x_lo_p, (base,), (w,))
        qi_win = jax.lax.dynamic_slice(qi_p, (base,), (w,))
        sc_win = jax.lax.dynamic_slice(st["scores"], (base,), (w,))
        par_win = jax.lax.dynamic_slice(st["parents"], (base,), (w,))

        j_abs = offset + i - w + j_rel  # GLOBAL anchor index per window slot
        in_win = (j_abs >= st_i) & (j_abs >= 0)

        # dr is exact in int32 inside the window (<= max_dist_x)
        dr = (
            x_lo_i.astype(jnp.uint32) - x_lo_win.astype(jnp.uint32)
        ).astype(jnp.int32)
        dq = qi_i - qi_win
        dd = jnp.abs(dr - dq)
        eligible = (
            in_win
            & (dr != 0)
            & (dq > 0)
            & (dq <= max_dist_y)
            & (dq <= max_dist_x)
            & (dd <= bw)
        )
        min_d = jnp.minimum(jnp.minimum(dq, dr), qspan_i)
        gap = gap_table[jnp.clip(dd, 0, bw)]
        sc = jnp.where(eligible, min_d - gap + sc_win, NEG)

        # running max over later-visited (higher-index) anchors, exclusive
        sc_rev = sc[::-1]  # descending visit order
        rm_rev_inc = jax.lax.cummax(sc_rev)
        rm_rev_exc = jnp.concatenate([jnp.array([NEG], jnp.int32), rm_rev_inc[:-1]])
        rm_rev = jnp.maximum(rm_rev_exc, qspan_i)
        improve_rev = (sc_rev > rm_rev) & eligible[::-1]

        # marks: scatter parents of eligible anchors into window positions
        mark_pos = par_win - (offset + i - w)  # window-relative parent pos
        do_mark = eligible & (par_win >= 0) & (mark_pos >= 0)
        marked = (
            jnp.zeros((w + 1,), jnp.int32)
            .at[jnp.where(do_mark, mark_pos, w)]
            .max(do_mark.astype(jnp.int32))[:w]
        )
        skip_rev = eligible[::-1] & ~improve_rev & (marked[::-1] > 0)

        # n_skip walk (descending): +1 on skip, -1 on improve, 0-clamped
        e = skip_rev.astype(jnp.int32) - improve_rev.astype(jnp.int32)
        s_walk = jnp.cumsum(e)
        c_walk = s_walk - jnp.minimum(jnp.int32(0), jax.lax.cummin(s_walk))
        brk = skip_rev & (c_walk > MAX_SKIP)
        t_idx = jnp.arange(w, dtype=jnp.int32)
        brk_t = jnp.min(jnp.where(brk, t_idx, w))
        processed_rev = t_idx < brk_t

        sc_proc = jnp.where(processed_rev, sc_rev, NEG)
        m = jnp.max(sc_proc)
        has = m > qspan_i
        # max_j = largest absolute j with sc == m (first strict improvement
        # in descending visit order) — in reversed coords the SMALLEST t
        t_best = jnp.min(jnp.where(sc_proc == m, t_idx, w))
        j_best = offset + i - 1 - t_best  # GLOBAL: t=0 -> j = i-1
        max_f = jnp.where(has, m, qspan_i)
        max_j = jnp.where(has, j_best, -1)

        peak_parent = st["peaks"][jnp.maximum(max_j - offset, -w) + w]
        peak = jnp.where((max_j >= 0) & (peak_parent > max_f), peak_parent, max_f)

        scores = jax.lax.dynamic_update_slice(st["scores"], max_f[None], (i + w,))
        parents = jax.lax.dynamic_update_slice(st["parents"], max_j[None], (i + w,))
        peaks = jax.lax.dynamic_update_slice(st["peaks"], peak[None], (i + w,))
        return dict(scores=scores, parents=parents, peaks=peaks), None

    state, _ = jax.lax.scan(step, state, jnp.arange(n_pad, dtype=jnp.int32))
    return state["scores"][w:], state["parents"][w:], state["peaks"][w:]


@functools.partial(jax.jit, static_argnames=("w", "n_pad", "max_dist_x", "max_dist_y", "bw"))
def chain_dp_device(x_lo, qi, qspan, st_eff, gap_table, n, w, n_pad, max_dist_x, max_dist_y, bw):
    return _chain_dp_core(x_lo, qi, qspan, st_eff, gap_table, n, w, n_pad,
                          max_dist_x, max_dist_y, bw)


@functools.partial(jax.jit, static_argnames=("w", "n_pad", "max_dist_x", "max_dist_y", "bw"))
def chain_dp_device_batch(x_lo, qi, qspan, st_eff, gap_table, n,
                          w, n_pad, max_dist_x, max_dist_y, bw):
    """vmapped chain DP over a batch of same-bucket calls: [B, n_pad] inputs,
    per-call gap tables [B, bw+1].  Batching turns each scan step into
    [B, w]-wide vector work, amortizing the per-step loop overhead that
    dominates single-call throughput on TPU (the reference's equivalent is
    the OpenMP loop over calls, host_kernel.cpp:484-487)."""

    def one(xl, q, qs, st, gt, nn):
        return _chain_dp_core(xl, q, qs, st, gt, nn, w, n_pad,
                              max_dist_x, max_dist_y, bw)

    return jax.vmap(one)(x_lo, qi, qspan, st_eff, gap_table, n)


NC_RING = 2048  # chain_pallas ring chunk (kept in sync with chain_pallas)
W_CAP = 512  # max pallas window (sublane) size; wider windows take the scan
#              (reference max_iter=5000 windows are rare but possible)


def pad_anchor_bucket(n: int) -> int:
    """Power-of-two buckets throughout (reference calls reach ~87k
    anchors -> 131072).  Coarser big-call buckets than the old
    multiples-of-8192 scheme: remote Mosaic compiles cost minutes per
    (n_pad, w) shape, and merging near-size calls into one bucket packs
    the 128-lane tiles better than splitting them across several
    mostly-empty ones (measured on the 1001-call dataset: fewer total
    kernel steps, 7 fewer compile variants)."""
    return max(64, int(2 ** np.ceil(np.log2(max(n, 1)))))


def _pallas_eligible(tables_ok: bool, n_pad: int, w: int, backend: str):
    """Route to the Pallas chain kernel when it can run: step-form gap
    tables, 64-aligned n_pad, window <= 128 lanes.  The ring-carry kernel
    (chain_pallas) holds only [nc+w] rows of sequential state in VMEM, so
    call size is HBM-bound — reference-scale 87k-anchor calls included;
    the ring needs n_pad to be one chunk or a multiple of chunks and the
    carry to cover the window (n_pad >= w)."""
    return (tables_ok and n_pad % 64 == 0 and w <= W_CAP and n_pad >= w
            and (n_pad <= NC_RING or n_pad % NC_RING == 0)
            and backend != "cpu")


LAST_ROUTE = {"pallas": 0, "scan": 0}  # calls per engine, last batch
#              (diagnostic for tests/benches: proves the split routed)


def chain_calls_batched(calls, w: int | None = None, n_pad: int | None = None):
    """Run a list of prepared calls (same max_dist/bw) as one device batch.

    Pads every call to a common n_pad/w bucket; returns a list of
    (scores, parents, peaks) numpy tuples in input order."""
    calls = list(calls)
    nonempty = [c for c in calls if c["n"] > 0]
    if not nonempty:
        z = np.zeros(0, np.int32)
        return [(z, z.astype(np.int64), z) for _ in calls]
    if w is None:
        w_need = max(c["w_need"] for c in nonempty)
        w = max(int(2 ** np.ceil(np.log2(max(w_need, 1)))), 16)
        w = min(w, MAX_ITER + 16)
    if n_pad is None:
        n_pad = pad_anchor_bucket(max(c["n"] for c in nonempty))

    def p(a, fill=0):
        return np.pad(a, (0, n_pad - len(a)), constant_values=fill)

    stack = {
        "x_lo": np.stack([p(c["x_lo"].view(np.int32)) for c in nonempty]),
        "qi": np.stack([p(c["qi"]) for c in nonempty]),
        "qspan": np.stack([p(c["qspan"]) for c in nonempty]),
        "st_eff": np.stack([p(c["st_eff"]) for c in nonempty]),
        "gap_table": np.stack([c["gap_table"] for c in nonempty]),
        "n": np.array([c["n"] for c in nonempty], np.int32),
    }
    c0 = nonempty[0]
    # pallas fast path (ops/chain_pallas.py, ~75x the XLA scan) per call:
    # calls whose gap table has an exact fixed-point slope run the kernel;
    # the rare infeasible ones (exact-quarter avg_qspans like 25.0, where
    # the reference's 0.01f double-rounding wobble admits no single slope)
    # run the XLA scan as their own sub-batch — one unlucky call no longer
    # routes the whole bucket to the slow path.
    from .chain_pallas import LANE_TILE, chain_dp_pallas_batch, gap_fixed_point

    import jax

    steps, gap0, ok = gap_fixed_point(stack["gap_table"], c0["bw"])
    kernel_ok = _pallas_eligible(True, n_pad, w, jax.default_backend())
    feas = np.nonzero(ok)[0] if kernel_ok else np.zeros(0, np.int64)
    infeas = (np.nonzero(~ok)[0] if kernel_ok
              else np.arange(len(nonempty), dtype=np.int64))
    LAST_ROUTE["pallas"], LAST_ROUTE["scan"] = len(feas), len(infeas)

    b_total = stack["x_lo"].shape[0]
    scores = np.zeros((b_total, n_pad), np.int32)
    parents = np.zeros((b_total, n_pad), np.int32)
    peaks = np.zeros((b_total, n_pad), np.int32)

    if len(feas):
        b0 = len(feas)
        b_pad = -(-b0 // LANE_TILE) * LANE_TILE

        def padb(a, fill=0):
            # ship only the real lanes; zero-fill the lane tile ON DEVICE
            # (sparse big-call buckets were shipping up to 10x padding
            # bytes through the relay — 46 MB/array for 13 real calls)
            a = jnp.asarray(a[feas])
            return jnp.pad(a, ((0, b_pad - b0),) + ((0, 0),) * (a.ndim - 1),
                           constant_values=fill)

        sc, par, pk = chain_dp_pallas_batch(
            padb(stack["x_lo"]), padb(stack["qi"]),
            padb(stack["qspan"]), padb(stack["st_eff"]),
            padb(steps), padb(gap0), padb(stack["n"]),
            w, n_pad, c0["max_dist_x"], c0["max_dist_y"], c0["bw"],
        )
        # slice the padding lanes off on device and pack the three
        # outputs into ONE array: the relay fetch costs ~27 ms each
        # regardless of size, and padding rows never cross the wire
        packed = np.asarray(jnp.stack([sc[:b0], par[:b0], pk[:b0]]))
        scores[feas] = packed[0]
        parents[feas] = packed[1]
        peaks[feas] = packed[2]
    if len(infeas):
        sc, par, pk = chain_dp_device_batch(
            *(jnp.asarray(stack[k][infeas]) for k in
              ("x_lo", "qi", "qspan", "st_eff", "gap_table", "n")),
            w, n_pad, c0["max_dist_x"], c0["max_dist_y"], c0["bw"],
        )
        packed = np.asarray(jnp.stack([sc, par, pk]))
        scores[infeas] = packed[0]
        parents[infeas] = packed[1]
        peaks[infeas] = packed[2]
    out = []
    bi = 0
    for c in calls:
        if c["n"] == 0:
            z = np.zeros(0, np.int32)
            out.append((z, z.astype(np.int64), z))
        else:
            nn = c["n"]
            out.append((scores[bi, :nn], parents[bi, :nn].astype(np.int64),
                        peaks[bi, :nn]))
            bi += 1
    return out


@jax.jit
def _decode_delta_inputs(w1, w2, c_lane, c_pos, c_x, c_qi, c_st, c_m):
    """Device-side inverse of _encode_delta_inputs: reconstruct the four
    per-anchor i32 kernel arrays from the 8-byte delta wire via lane-axis
    cumsums (i32 adds wrap like the u32 x_lo arithmetic the kernel uses).
    Sparse corrections (call boundaries, oversized deltas, lane starts)
    are scatter-added onto the delta planes before the cumsum; the slope
    plane is corrections-only (the slope is constant within a call)."""
    dx = w1 & 0xFFFF
    dqi = jax.lax.shift_right_arithmetic(w1, 16)  # sign-extended i16
    dst = w2 & 0xFFFF
    qspan = jax.lax.shift_right_logical(w2, 16) & 0xFF
    zero = jnp.zeros(w1.shape, jnp.int32)
    x = jnp.cumsum(dx + zero.at[c_lane, c_pos].add(c_x), axis=1)
    qi = jnp.cumsum(dqi + zero.at[c_lane, c_pos].add(c_qi), axis=1)
    st = jnp.cumsum(dst + zero.at[c_lane, c_pos].add(c_st), axis=1)
    m = jnp.cumsum(zero.at[c_lane, c_pos].add(c_m), axis=1)
    word = (m << 8) | qspan
    return x, qi, word, st


def _encode_delta_inputs(pk, slope_plane):
    """Host-side 8-byte-per-anchor wire for the packed chain inputs.

    x_lo is sorted per call (minimap2 anchors are ref-position sorted,
    benchmarks/chain/src/host_kernel.cpp:58-479), st_eff is
    non-decreasing along each packed lane, and qi moves in small steps —
    so each becomes a u16/i16 delta riding two i32 words per anchor
    (dx | dqi<<16, dst | qspan<<16) instead of four (16 -> 8 B/anchor on
    a ~70 MB/s relay link).  Out-of-range deltas (call boundaries, lane
    starts, rare jumps) go to a sparse correction channel, and the
    per-call gap slope ships ONLY as corrections.  Returns
    (w1, w2, corr dict of i32 arrays padded to a power-of-2 length).

    Runs in C++ when the native lib is built (gt_chain_encode, one
    pass; the numpy formulation below is ~10 full-plane passes)."""
    from ..io.native import chain_encode_native

    nat = chain_encode_native(
        np.ascontiguousarray(pk["x_lo"], np.int32),
        np.ascontiguousarray(pk["qi"], np.int32),
        np.ascontiguousarray(pk["st_eff"], np.int32),
        np.ascontiguousarray(slope_plane, np.int32),
        np.ascontiguousarray(pk["qspan8"], np.int32))
    if nat is not None:
        w1, w2, corr_k, k = nat
        k_pad = max(256, int(2 ** np.ceil(np.log2(max(k, 1)))))
        corr = {}
        for nm in ("lane", "pos", "x", "qi", "st", "m"):
            a = np.zeros(k_pad, np.int32)
            a[:k] = corr_k[nm][:k]
            corr[nm] = a
        return w1, w2, corr

    def deltas(a):
        d = np.empty_like(a)
        d[:, 0] = a[:, 0]
        np.subtract(a[:, 1:], a[:, :-1], out=d[:, 1:])  # i32 wrap = u32 wrap
        return d

    dx = deltas(pk["x_lo"])
    dqi = deltas(pk["qi"])
    dst = deltas(pk["st_eff"])
    dm = deltas(slope_plane)
    ok_x = (dx >= 0) & (dx < 1 << 16)
    ok_qi = (dqi >= -(1 << 15)) & (dqi < 1 << 15)
    ok_st = (dst >= 0) & (dst < 1 << 16)
    esc = ~(ok_x & ok_qi & ok_st) | (dm != 0)
    lanes, pos = np.nonzero(esc)
    k = len(lanes)
    k_pad = max(256, int(2 ** np.ceil(np.log2(max(k, 1)))))
    corr = {
        "lane": np.zeros(k_pad, np.int32),
        "pos": np.zeros(k_pad, np.int32),
        "x": np.zeros(k_pad, np.int32),
        "qi": np.zeros(k_pad, np.int32),
        "st": np.zeros(k_pad, np.int32),
        "m": np.zeros(k_pad, np.int32),
    }
    corr["lane"][:k] = lanes
    corr["pos"][:k] = pos
    # escaped slots ship delta 0; the correction carries the true delta
    ex, eqi, est = ~ok_x[esc], ~ok_qi[esc], ~ok_st[esc]
    corr["x"][:k] = np.where(ex, dx[esc], 0)
    corr["qi"][:k] = np.where(eqi, dqi[esc], 0)
    corr["st"][:k] = np.where(est, dst[esc], 0)
    corr["m"][:k] = dm[esc]
    dx = np.where(esc & ~ok_x, 0, dx)
    dqi = np.where(esc & ~ok_qi, 0, dqi)
    dst = np.where(esc & ~ok_st, 0, dst)
    w1 = (dx & 0xFFFF) | (dqi << 16)
    w2 = (dst & 0xFFFF) | (pk["qspan8"].astype(np.int32) << 16)
    return w1, w2, corr


@functools.partial(jax.jit, static_argnames=("want_peaks",))
def _pack_chain_outputs(sc, par, pk, want_peaks: bool):
    """Device-side output packing for the lane-packed path: parents
    become u16 window deltas (0 = no parent; the window is <= W_CAP=512
    rows so deltas fit 16 bits), two per i32 word, concatenated after
    the scores (and peaks when requested) so ONE fetch ships 6 or 10
    bytes per anchor instead of three 4-byte arrays."""
    iota = jnp.arange(sc.shape[1], dtype=jnp.int32)[None, :]
    delta = jnp.where(par >= 0, iota - par, 0)
    dw = delta[:, 0::2] | (delta[:, 1::2] << 16)
    outs = [sc, dw] + ([pk] if want_peaks else [])
    return jnp.concatenate(outs, axis=1)


def chain_calls_packed(calls, lane_tile: int = 128,
                       force_kernel: bool = False, nc: int = 1024,
                       timings: dict | None = None,
                       want_peaks: bool = True):
    """Run a list of prepared calls with MULTIPLE CALLS PER LANE.

    The bucketed path (chain_calls_batched) gives every call its own
    kernel lane padded to the bucket size — on real datasets (1001 calls,
    log-uniform n up to 87k; benchmarks/chain/src/main.cpp:100-101) that
    is ~5x padding waste and ~19 compile variants.  Here calls are
    greedy-balance packed into lane_tile lanes per window group,
    concatenated along the anchor axis:

      * st_eff (already per-anchor) is offset by each call's start, so
        the kernel's `j_abs >= st_i` fence makes cross-call predecessor
        rows ineligible — no other state is per-call except the gap
        slope, which becomes a per-anchor array (chain_pallas per_anchor
        mode; prepare_call's gap_table[0] is identically 0, asserted);
      * one launch per window group (w, max_dist, bw) instead of one per
        (n_pad, w) bucket — fewer Mosaic compiles and full lanes.

    Calls that cannot run the kernel (no exact fixed-point slope, w over
    W_CAP, nonzero gap0) fall back per bucket through
    chain_calls_batched.  force_kernel packs even on the CPU backend
    (interpret-mode tests).  Returns (scores, parents, peaks) numpy
    tuples in input order; parents are call-local indices.

    Transfer layout (the relay moves ~80 MB/s, so bytes — not FLOPs —
    bound dataset-scale wall time; tools/chain_phase_probe.py): inputs
    ship as 4 per-anchor i32 arrays (slope packed into qspan's word);
    all groups dispatch async first and fetch after (ship/kernel/fetch
    pipeline across groups); outputs come back as ONE array per group
    with parents as u16 window deltas (two per i32 word) and peaks
    omitted when want_peaks=False (the reference driver dumps only
    scores+parents, host_data_io.cpp print_return) — in that case the
    third tuple element is None.
    """
    import heapq
    import time as _time

    import jax

    from .chain_pallas import chain_dp_pallas_batch, gap_fixed_point

    tm = timings if timings is not None else {}
    tm.setdefault("route_s", 0.0)
    tm.setdefault("pack_s", 0.0)
    tm.setdefault("ship_s", 0.0)
    tm.setdefault("kernel_s", 0.0)
    tm.setdefault("fetch_s", 0.0)
    tm.setdefault("unpack_s", 0.0)
    _t0 = _time.perf_counter()
    calls = list(calls)
    results = [None] * len(calls)
    groups = {}   # (w, mdx, mdy, bw) -> list[(idx, prep, m_slope)]
    fallback = {}  # (n_pad, w, mdx, mdy, bw) -> list[(idx, prep)]
    backend = jax.default_backend()
    for i, c in enumerate(calls):
        if c["n"] == 0:
            z = np.zeros(0, np.int32)
            results[i] = (z, z.astype(np.int64), z)
            continue
        w = max(int(2 ** np.ceil(np.log2(max(c["w_need"], 1)))), 16)
        w = min(w, MAX_ITER + 16)
        key_fb = (pad_anchor_bucket(c["n"]), w,
                  c["max_dist_x"], c["max_dist_y"], c["bw"])
        if w > W_CAP or (backend == "cpu" and not force_kernel):
            fallback.setdefault(key_fb, []).append((i, c))
            continue
        m, g0, ok = gap_fixed_point(c["gap_table"][None, :], c["bw"])
        if not ok[0] or g0[0] != 0:
            fallback.setdefault(key_fb, []).append((i, c))
            continue
        groups.setdefault((w, c["max_dist_x"], c["max_dist_y"], c["bw"]),
                          []).append((i, c, int(m[0])))
    tm["route_s"] += _time.perf_counter() - _t0

    # phase 1: pack + dispatch every group (transfers and kernels overlap
    # through the relay's async stream); phase 2 fetches in launch order
    pending = []  # (placed, n_pad, device handle)
    for (w, mdx, mdy, bw), members in groups.items():
        _t0 = _time.perf_counter()
        # nc=1024 default: chain_pallas per_anchor scoped-VMEM model
        assert nc >= w, (nc, w)
        # greedy balance: largest call first onto the least-loaded lane
        members.sort(key=lambda t: -t[1]["n"])
        heap = [(0, lane) for lane in range(lane_tile)]
        heapq.heapify(heap)
        placed = [[] for _ in range(lane_tile)]  # lane -> [(idx, prep, off)]
        for idx, prep, m in members:
            load, lane = heapq.heappop(heap)
            placed[lane].append((idx, prep, m, load))
            heapq.heappush(heap, (load + prep["n"], lane))
        max_load = max(load for load, _ in heap)
        n_pad = max(-(-max_load // nc) * nc, nc)

        zeros_b = np.zeros(lane_tile, np.int32)
        n_arr = np.array([sum(p["n"] for _, p, _, _ in items)
                          for items in placed], np.int32)
        # 8-byte delta wire (was 16): x/qi/st as u16/i16 deltas in two
        # words, slope + escapes via the sparse correction channel.
        # Native: one fused pass straight from the per-call arrays
        # (gt_chain_pack_encode) — the [lanes, n_pad] staging planes and
        # the multi-pass numpy encode (pack_s ~3.4 s at 12M anchors,
        # tools/chain_phase_probe.py) never materialize.
        from ..io.native import chain_pack_encode_native

        rows = sorted(
            ((lane, off, prep, m) for lane, items in enumerate(placed)
             for _i, prep, m, off in items), key=lambda t: (t[0], t[1]))
        nat = chain_pack_encode_native(
            [(np.ascontiguousarray(p["x_lo"].view(np.int32)),
              np.ascontiguousarray(p["qi"], np.int32),
              np.ascontiguousarray(p["st_eff"], np.int32),
              np.ascontiguousarray(p["qspan"], np.int32),
              p["n"], lane, off, m) for lane, off, p, m in rows],
            lane_tile, n_pad)
        if nat is not None:
            w1, w2, corr_k, kc = nat
            k_pad = max(256, int(2 ** np.ceil(np.log2(max(kc, 1)))))
            corr = {nm: np.zeros(k_pad, np.int32) for nm in corr_k}
            for nm in corr_k:
                corr[nm][:kc] = corr_k[nm][:kc]
        else:
            pk = {k: np.zeros((lane_tile, n_pad), np.int32)
                  for k in ("x_lo", "qi", "qspan8", "st_eff")}
            slope_plane = np.zeros((lane_tile, n_pad), np.int32)
            for lane, items in enumerate(placed):
                for idx, prep, m, off in items:
                    nn = prep["n"]
                    sl = slice(off, off + nn)
                    pk["x_lo"][lane, sl] = prep["x_lo"].view(np.int32)
                    pk["qi"][lane, sl] = prep["qi"]
                    pk["qspan8"][lane, sl] = prep["qspan"]
                    slope_plane[lane, sl] = m
                    pk["st_eff"][lane, sl] = prep["st_eff"] + off
            w1, w2, corr = _encode_delta_inputs(pk, slope_plane)
        tm["pack_s"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        dev = [jnp.asarray(a) for a in (w1, w2)]
        cdev = [jnp.asarray(corr[k])
                for k in ("lane", "pos", "x", "qi", "st", "m")]
        if timings is not None:  # force transfer completion to split phases
            _ = np.asarray(dev[-1][0, 0])
            tm["ship_s"] += _time.perf_counter() - _t0
            _t0 = _time.perf_counter()
        d_x, d_qi, d_word, d_st = _decode_delta_inputs(*dev, *cdev)
        sc, par, peaks = chain_dp_pallas_batch(
            d_x, d_qi, d_word, d_st,
            jnp.asarray(zeros_b), jnp.asarray(zeros_b),
            jnp.asarray(n_arr), w, n_pad, mdx, mdy, bw,
            lane_tile=lane_tile, nc=nc, per_anchor=True)
        out_dev = _pack_chain_outputs(sc, par, peaks, want_peaks)
        if timings is not None:  # force kernel completion
            _ = np.asarray(out_dev[0, 0])
            tm["kernel_s"] += _time.perf_counter() - _t0
        pending.append((placed, n_pad, out_dev))

    from ..io.native import chain_unpack_native

    for placed, n_pad, out_dev in pending:
        _t0 = _time.perf_counter()
        fetched = np.asarray(out_dev)
        tm["fetch_s"] += _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        flat = [(idx, prep["n"], lane, off)
                for lane, items in enumerate(placed)
                for idx, prep, m, off in items]
        nat = chain_unpack_native(
            fetched, lane_tile, n_pad, want_peaks,
            [(n, lane, off) for _idx, n, lane, off in flat])
        if nat is not None:
            for (idx, *_), out in zip(flat, nat):
                results[idx] = out
        else:
            sc_h = fetched[:, :n_pad]
            dw = fetched[:, n_pad : n_pad + n_pad // 2]
            # two u16 window deltas per i32 word; delta 0 = no parent
            delta = np.empty((lane_tile, n_pad), np.int32)
            delta[:, 0::2] = dw & 0xFFFF
            delta[:, 1::2] = (dw >> 16) & 0xFFFF
            iota = np.arange(n_pad, dtype=np.int64)[None, :]
            par_h = np.where(delta > 0, iota - delta, -1)
            pk_h = fetched[:, n_pad + n_pad // 2 :] if want_peaks else None
            for lane, items in enumerate(placed):
                for idx, prep, m, off in items:
                    nn = prep["n"]
                    sl = slice(off, off + nn)
                    p_sl = par_h[lane, sl]
                    results[idx] = (
                        sc_h[lane, sl].copy(),
                        np.where(p_sl >= 0, p_sl - off, -1),
                        pk_h[lane, sl].copy() if want_peaks else None,
                    )
        tm["unpack_s"] += _time.perf_counter() - _t0
    for (n_pad, w, *_), members in fallback.items():
        outs = chain_calls_batched([p for _, p in members], w=w, n_pad=n_pad)
        for (i, _), out in zip(members, outs):
            results[i] = out
    # after the fallback loop: chain_calls_batched resets LAST_ROUTE
    LAST_ROUTE["pallas"] = sum(len(m) for m in groups.values())
    LAST_ROUTE["scan"] = sum(len(m) for m in fallback.values())
    return results


def chain_call(call_dict, w: int | None = None, n_pad: int | None = None,
               engine: str = "auto"):
    """Run one prepared call on device; returns numpy (scores, parents,
    peaks).  engine="auto" routes through the batched pallas ring kernel
    when eligible (87k-anchor reference calls included); "scan" forces
    the XLA scan path."""
    n = call_dict["n"]
    if n == 0:
        z = np.zeros(0, np.int32)
        return z, z.astype(np.int64), z
    if engine == "auto":
        import jax

        from .chain_pallas import gap_fixed_point

        npad_auto = n_pad if n_pad is not None else pad_anchor_bucket(n)
        w_auto = w
        if w_auto is None:
            w_auto = max(int(2 ** np.ceil(np.log2(
                max(call_dict["w_need"], 1)))), 16)
            w_auto = min(w_auto, MAX_ITER + 16)
        _, _, ok = gap_fixed_point(call_dict["gap_table"][None, :],
                                   call_dict["bw"])
        if _pallas_eligible(bool(ok.all()), npad_auto, w_auto,
                            jax.default_backend()):
            return chain_calls_batched([call_dict], w=w_auto,
                                       n_pad=npad_auto)[0]
    if w is None:
        w = max(int(2 ** np.ceil(np.log2(max(call_dict["w_need"], 1)))), 16)
        w = min(w, MAX_ITER + 16)
    if n_pad is None:
        n_pad = n
    x_lo = call_dict["x_lo"].view(np.int32)
    pad = n_pad - n
    def p(a, fill=0):
        return np.pad(a, (0, pad), constant_values=fill)

    scores, parents, peaks = chain_dp_device(
        jnp.asarray(p(x_lo)),
        jnp.asarray(p(call_dict["qi"])),
        jnp.asarray(p(call_dict["qspan"])),
        jnp.asarray(p(call_dict["st_eff"])),
        jnp.asarray(call_dict["gap_table"]),
        n,
        w,
        n_pad,
        call_dict["max_dist_x"],
        call_dict["max_dist_y"],
        call_dict["bw"],
    )
    return (
        np.asarray(scores)[:n],
        np.asarray(parents)[:n].astype(np.int64),
        np.asarray(peaks)[:n],
    )
