"""Pallas TPU kernel for adaptive banded event alignment (f5c eventalign).

The vmapped lax.scan (ops/abea.py abea_fill_bands) lowers its per-lane
dynamic band slices to XLA gathers (~330 ms per 64-read batch); here each
READ is one grid step, so every band offset is a SCALAR: windows of the
VMEM-resident per-read tables are cyclic lane-rolls (dynamic lane rolls
are supported; dynamic lane slices are not) followed by a static slice,
and the band state lives in vector registers.

Per band the trace row also carries the move decision (down/right, lane
bw) and the band's f32 last-kmer value spread as 16 2-bit pieces (lanes
LV_LANE0..+15), so the host reconstructs band positions and runs its
f64-exact backtrack-seed search from the single trace fetch.  Every cell
of a trace row is <=2 bits, so rows are packed 4 cells/byte on device —
the host fetch through the relay (the abea bottleneck, see PERF.md)
shrinks 4x.

Bit-identical to abea_fill_bands (same f32 op order; tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .oracle import abea as oracle

ALN_BANDWIDTH = oracle.ALN_BANDWIDTH
FROM_D, FROM_U, FROM_L = 0, 1, 2
NEG = np.float32(-np.inf)
LANES = 128  # band vectors live on the lane axis (bw=100 -> 128 padded)
LV_LANE0 = 104  # first of the 16 lanes holding the 2-bit last_val pieces


def _kernel(params, ev_ref, gm_ref, stdv_ref, lstdv_ref, ne_ref, nk_ref,
            lp_ref, trim_ref, trace_ref, row_scratch, band_ref, st_ref):
    n_bands, bw, chunk = params
    n_rows_tbl = ev_ref.shape[1]  # table sublane rows (incl. 1 pad row)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    in_bw = l_iota < bw
    half = bw // 2
    ci = pl.program_id(1)  # band-row chunk (grid minor axis: chunks of one
    # read run consecutively, so band_ref/st_ref persist read state)

    r8 = pl.program_id(0) % 8  # SMEM blocks cover 8 reads (tiling rule)
    n_events = ne_ref[r8, 0]
    n_kmers = nk_ref[r8, 0]
    # hi/lo f32 splits of the DOUBLE transition penalties: the C adds a
    # double constant to the f32 band value and rounds once on the float
    # store (align.c:371-373); compensated sums reproduce that rounding
    skip_hi, skip_lo = lp_ref[r8, 0], lp_ref[r8, 1]
    stay_hi, stay_lo = lp_ref[r8, 2], lp_ref[r8, 3]
    step_hi, step_lo = lp_ref[r8, 4], lp_ref[r8, 5]
    trim_hi = lp_ref[r8, 6]
    trim_rows = trim_ref.shape[1]

    neg = jnp.full((1, LANES), NEG, jnp.float32)

    def splat_f(x):
        return jnp.zeros((1, LANES), jnp.float32) + x

    def splat_i(x):
        return jnp.zeros((1, LANES), jnp.int32) + x

    @pl.when(ci == 0)
    def _init():
        band0 = jnp.where(l_iota == half, 0.0, neg)
        band1 = jnp.where(l_iota == half, splat_f(trim_hi), neg)
        band_ref[0:1, :] = band0  # ring: band bi lives at row bi % 8
        band_ref[1:2, :] = band1
        # carry (e1, k1, e2, k2): band positions of bi-1 / bi-2
        st_ref[0] = half
        st_ref[1] = -1 - half
        st_ref[2] = half - 1
        st_ref[3] = -1 - half

    def window(ref, off):
        """ref [1, R, LANES] (row-major table) -> lanes [off, off+LANES).

        A dynamic 2-sublane slice + one dynamic lane roll: the window
        spans table rows off>>7 and off>>7 + 1, rotated into place.  The
        old whole-table cyclic roll cost O(tbl_len) VPU lanes PER BAND —
        quadratic in read length, the reason long reads were capped.
        Out-of-range offsets (short reads padded to the bucket's band
        count) clamp and read garbage that `valid` masks, like the old
        modulo wrap did."""
        off = jnp.clip(off, 0, (n_rows_tbl - 2) * LANES + LANES - 1)
        q = jax.lax.shift_right_logical(off, 7)
        m = off & (LANES - 1)
        rows2 = ref[0, pl.ds(q, 2), :]  # [2, LANES]
        a = pltpu.roll(rows2, (LANES - m) % LANES, axis=1)
        return jnp.where(l_iota < LANES - m, a[0:1, :], a[1:2, :])

    def scalar_at(v, lane):
        """Extract lane `lane` of a (1, LANES) band as a scalar (max keeps
        -inf intact)."""
        return jnp.max(jnp.where(l_iota == lane, v, NEG))

    def two_sum(a, b):
        t = a + b
        bb = t - a
        return t, (a - (t - bb)) + (b - bb)

    def add_c_add(x, c_hi, c_lo, y):
        """fl32(f64(x) + c + f64(y)) via compensated f32 sums."""
        s1, e1 = two_sum(x, c_hi)
        s2, e2 = two_sum(s1, y)
        comp = s2 + ((e1 + c_lo) + e2)
        return jnp.where(jnp.isneginf(x), x, comp)

    def add_c(x, c_hi, c_lo):
        s1, e1 = two_sum(x, c_hi)
        comp = s1 + (e1 + c_lo)
        return jnp.where(jnp.isneginf(x), x, comp)

    def body(bi, carry):
        e1, k1, e2, k2 = carry
        b1 = band_ref[pl.ds((bi - 1) % 8, 1), :]
        b2 = band_ref[pl.ds((bi - 2) % 8, 1), :]
        ll = scalar_at(b1, 0)
        ur = scalar_at(b1, bw - 1)
        both_ob = jnp.isneginf(ll) & jnp.isneginf(ur)
        right = jnp.where(both_ob, (bi % 2) == 1, ll < ur).astype(jnp.int32)
        be = e1 + (1 - right)
        bk = k1 + right

        # shifted reads of the previous two bands (lane rolls, masked edges)
        def shift_band(v, s):  # band value at lane o <- v[o + s - 1], s in {0,1,2}
            if s == 1:
                return v
            rolled = pltpu.roll(v, (LANES - (s - 1)) % LANES, axis=1)
            if s == 0:
                return jnp.where(l_iota >= 1, rolled, NEG)
            return jnp.where(l_iota < LANES - 1, rolled, NEG)

        right_v = splat_i(right) == 1
        up = jnp.where(right_v, shift_band(b1, 2), shift_band(b1, 1))
        left = jnp.where(right_v, shift_band(b1, 1), shift_band(b1, 0))
        dk2 = bk - k2  # in {0, 1, 2}
        dk2_v = splat_i(dk2)
        diag = jnp.where(
            dk2_v == 0, shift_band(b2, 0),
            jnp.where(dk2_v == 1, shift_band(b2, 1), shift_band(b2, 2)))

        gm = window(gm_ref, bk + bw)
        stdv = window(stdv_ref, bk + bw)
        lstdv = window(lstdv_ref, bk + bw)
        levels = window(ev_ref, n_events - 1 - be + bw)
        a = (levels - gm) / stdv
        lp_emit = jnp.float32(-0.918938) - lstdv - 0.5 * a * a

        score_d = add_c_add(diag, step_hi, step_lo, lp_emit)
        score_u = add_c_add(up, stay_hi, stay_lo, lp_emit)
        score_l = add_c(left, skip_hi, skip_lo)
        ms = score_d
        frm = jnp.zeros((1, LANES), jnp.int32)
        ms = jnp.maximum(ms, score_u)
        frm = jnp.where(ms == score_u, FROM_U, frm)
        ms = jnp.maximum(ms, score_l)
        frm = jnp.where(ms == score_l, FROM_L, frm)

        ei = splat_i(be) - l_iota
        ki = splat_i(bk) + l_iota
        valid = ((ki >= 0) & (ki < splat_i(n_kmers)) & (ei >= 0)
                 & (ei < splat_i(n_events)) & in_bw)
        new_band = jnp.where(valid, ms, NEG)
        new_trace = jnp.where(valid, frm, 0)

        # trim state at kmer -1
        to = -1 - bk
        t_ei = be - to
        t_ok = (to >= 0) & (to < bw)
        t_in = t_ok & (t_ei >= 0) & (t_ei < n_events)
        # the trim cell of band bi sits at event bi-1, so the host
        # precomputes fl32(lp_trim_f64 * bi) per band index
        t_bc = jnp.minimum(bi, trim_rows * LANES - 1)
        trow = trim_ref[0, pl.ds(jax.lax.shift_right_logical(t_bc, 7), 1), :]
        trim_here = jnp.max(jnp.where(l_iota == (t_bc & (LANES - 1)),
                                      trow, NEG))
        t_val = jnp.where(
            splat_i(t_in.astype(jnp.int32)) == 1, splat_f(trim_here), neg)
        sel_to = (splat_i(t_ok.astype(jnp.int32)) == 1) & (l_iota == splat_i(to))
        new_band = jnp.where(sel_to, t_val, new_band)
        new_trace = jnp.where(
            sel_to, jnp.where(splat_i(t_in.astype(jnp.int32)) == 1,
                              FROM_U, 0), new_trace)

        # last-kmer column value for the host's (f64-exact) backtrack-seed
        # search: NEG when the column is outside this band
        lo = (n_kmers - 1) - bk
        l_ok = (lo >= 0) & (lo < bw)
        band_bits = jax.lax.bitcast_convert_type(new_band, jnp.int32)
        neg_bits = jnp.int32(np.float32(NEG).view(np.int32))  # -inf pattern
        lv_sum = jnp.max(jnp.where(l_iota == splat_i(lo), band_bits,
                                   jnp.int32(-(1 << 31))))
        lv_bits = jnp.where(l_ok, lv_sum, neg_bits)

        # trace row: moves in lanes [0,bw); decision bit at lane bw; the
        # f32 last_val spread as 16 2-bit pieces at lanes 104..119 — every
        # cell of the row is then <=2 bits, so the wrapper packs 4 cells
        # per byte (the trace fetch through the relay is the abea
        # bottleneck; see PERF.md)
        out_row = jnp.where(l_iota == bw, splat_i(right), new_trace)
        two_idx = l_iota - LV_LANE0
        lv_two = (splat_i(lv_bits) >> jnp.clip(two_idx * 2, 0, 31)) & 3
        out_row = jnp.where((two_idx >= 0) & (two_idx < 16), lv_two, out_row)
        # u8 sublane-dynamic stores need 8-aligned offsets; stage rows in an
        # i32 scratch and cast to u8 once after the loop
        row_scratch[pl.ds(bi - 2 - ci * chunk, 1), :] = out_row
        band_ref[pl.ds(bi % 8, 1), :] = new_band

        return (be, bk, e1, k1)

    carry0 = (st_ref[0], st_ref[1], st_ref[2], st_ref[3])
    lo = ci * chunk + 2
    # the final chunk runs past n_bands when rows were padded to the
    # chunk grid; those bands write garbage rows the wrapper slices off
    e1, k1, e2, k2 = jax.lax.fori_loop(lo, lo + chunk, body, carry0)
    st_ref[0] = e1
    st_ref[1] = k1
    st_ref[2] = e2
    st_ref[3] = k2
    trace_ref[0, :, :] = row_scratch[:].astype(jnp.uint8)


def _round_up(v, q):
    return -(-v // q) * q


CHUNK_ROWS = 4096  # trace rows staged in VMEM per fill-grid step


@functools.partial(jax.jit, static_argnames=("n_bands", "tbl_len",
                                             "bandwidth", "chunk_rows"))
def abea_fill_bands_pallas(ev_pad, gm_pad, stdv_pad, lstdv_pad,
                           n_events, n_kmers, lp_consts, trim_tbl,
                           n_bands: int, tbl_len: int,
                           bandwidth: int = ALN_BANDWIDTH,
                           chunk_rows: int = CHUNK_ROWS):
    """Band fill for a batch of reads, one (read, band-chunk) per grid step.

    ev/gm/stdv/lstdv: [B, tbl_len] f32 per-read tables (event means
    reversed; pore-model rows gathered per kmer, scaled); n_events/
    n_kmers: [B] i32.  Returns PACKED traces [B, n_bands-2, LANES//4] u8:
    cell c of a row (2 bits: move for c<bw, decision at c=bw, last-val
    pieces at LV_LANE0..+15) lives in bits 2*(c//32) of byte c%32 —
    unpack with unpack_trace_rows.  Packing shrinks the host fetch 4x
    (the relay transfer is the abea bottleneck).

    Long reads (nanopore signals reach 10-100 kb -> up to ~300k bands,
    align.c:145-166 band sizing) stream the trace plane to HBM in
    chunk_rows slices; the 8-row band ring and the (e1,k1,e2,k2) carry
    persist in scratch across a read's chunk steps.
    """
    # strict <: at bandwidth == LV_LANE0 the decision bit at lane bw would
    # collide with last-val piece 0 (the lv write lands after it)
    assert bandwidth < LV_LANE0 and LV_LANE0 + 16 <= LANES
    assert tbl_len % LANES == 0
    b = ev_pad.shape[0]
    n_rows = n_bands - 2
    chunk = min(chunk_rows, _round_up(n_rows, 32))  # u8 tiles 32 sublanes
    n_chunks = -(-n_rows // chunk)

    def tbl(a):
        """[B, tbl_len] -> [b8, R, LANES] with one zero guard row (the
        2-sublane window slice may touch row off//128 + 1)."""
        a = padrow(a).reshape(b8, tbl_len // LANES, LANES)
        return jnp.concatenate(
            [a, jnp.zeros((b8, 1, LANES), a.dtype)], axis=1)

    def row_spec(rows):
        return pl.BlockSpec((1, rows, LANES), lambda i, c: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    smem_row = pl.BlockSpec((8, 1), lambda i, c: (i // 8, 0),
                            memory_space=pltpu.SMEM)
    b8 = _round_up(b, 8)

    def padrow(a):
        """Pad the read axis to b8 (SMEM blocks tile 8 reads)."""
        if b8 == b:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((b8 - b, a.shape[1]), a.dtype)], axis=0)

    ne2 = padrow(n_events[:, None].astype(jnp.int32))
    nk2 = padrow(n_kmers[:, None].astype(jnp.int32))
    lp2 = padrow(lp_consts)
    trim_pad = _round_up(trim_tbl.shape[0], LANES)
    trim2 = jnp.zeros(trim_pad, trim_tbl.dtype).at[: trim_tbl.shape[0]].set(
        trim_tbl).reshape(1, trim_pad // LANES, LANES)

    traces = pl.pallas_call(
        functools.partial(_kernel, (n_bands, bandwidth, chunk)),
        grid=(b8, n_chunks),
        in_specs=[row_spec(tbl_len // LANES + 1)] * 4 + [
            smem_row, smem_row,
            pl.BlockSpec((8, 8), lambda i, c: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, trim_pad // LANES, LANES),
                         lambda i, c: (0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk, LANES), lambda i, c: (i, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n_chunks * chunk, LANES),
                                       jnp.uint8),
        scratch_shapes=[pltpu.VMEM((chunk, LANES), jnp.int32),
                        pltpu.VMEM((8, LANES), jnp.float32),
                        pltpu.SMEM((4,), jnp.int32)],
    )(tbl(ev_pad), tbl(gm_pad), tbl(stdv_pad), tbl(lstdv_pad),
      ne2, nk2, lp2, trim2)
    q = LANES // 4
    traces = traces[:b, :n_rows]
    packed = (traces[:, :, 0:q] | (traces[:, :, q : 2 * q] << jnp.uint8(2))
              | (traces[:, :, 2 * q : 3 * q] << jnp.uint8(4))
              | (traces[:, :, 3 * q :] << jnp.uint8(6)))
    return packed


def unpack_trace_rows(packed: np.ndarray) -> np.ndarray:
    """[..., LANES//4] u8 packed rows -> [..., LANES] 2-bit cells."""
    q = LANES // 4
    cells = np.empty(packed.shape[:-1] + (LANES,), np.uint8)
    for kk in range(4):
        cells[..., q * kk : q * (kk + 1)] = (packed >> (2 * kk)) & 3
    return cells


def align_events_batch_pallas(sequences, event_means_list, model, scales,
                              shifts, bandwidth: int = ALN_BANDWIDTH,
                              k: int = oracle.KMER_SIZE,
                              device_walk: bool = True):
    """Pallas-backed batched eventalign (same contract as
    ops.abea.align_events_batch)."""
    from . import abea as A

    bw = bandwidth
    results = [None] * len(sequences)
    groups = {}
    for i, (seq, ev) in enumerate(zip(sequences, event_means_list)):
        if len(seq) - k + 1 < 1 or len(ev) < 1:
            results[i] = []
            continue
        key = (A._bucket(len(ev)), A._bucket(len(seq) - k + 1))
        groups.setdefault(key, []).append(i)

    lm = model["level_mean"].astype(np.float32)
    ls = model["level_stdv"].astype(np.float32)
    lls = model["level_log_stdv"].astype(np.float32)
    # VMEM bound: trace rows stream to HBM in CHUNK_ROWS slices (the ring
    # and carry persist across a read's chunk steps), so the binding
    # resource is the per-read tables (4 x tbl_len f32) plus the 2 MB
    # chunk scratch — ~500k bands (~250 kb reads, beyond any nanopore
    # read; align.c:145-166 sizes bands the same way) fit the 16 MB cap.
    MAX_BANDS = 1 << 19
    long_idxs = []
    for key in [k for k, v in groups.items() if k[0] + k[1] + 2 > MAX_BANDS]:
        long_idxs.extend(groups.pop(key))
    if long_idxs:
        from . import abea as A2

        sub = A2.align_events_batch(
            [sequences[i] for i in long_idxs],
            [event_means_list[i] for i in long_idxs], model,
            [scales[i] for i in long_idxs], [shifts[i] for i in long_idxs],
            bandwidth=bw, k=k, use_pallas=False)
        for i, res in zip(long_idxs, sub):
            results[i] = res

    # phase 1: prep + dispatch every group (async), so device fill of later
    # groups overlaps host decode/traceback of earlier ones
    pending = []
    for (e_buck, k_buck), idxs in groups.items():
        n_bands = e_buck + k_buck + 2
        tbl_len = _round_up(max(e_buck, k_buck) + 2 * bw, LANES)
        evs, gms, stds, lstds, lps, kranks = [], [], [], [], [], []
        ne_v, nk_v = [], []
        trim_tbl = None
        for i in idxs:
            (ev_pad, ranks_pad, lp_consts, trim_vals,
             kmer_ranks) = A._prep_read(
                sequences[i], event_means_list[i], bw, k, e_buck, k_buck)
            if trim_tbl is None:
                # lp_trim = log(0.01) is read-independent, one table/group
                trim_tbl = np.zeros(_round_up(len(trim_vals), LANES),
                                    np.float32)
                trim_tbl[: len(trim_vals)] = trim_vals
            sc = np.float32(scales[i])
            sh = np.float32(shifts[i])
            gm = (sc * lm[ranks_pad] + sh).astype(np.float32)
            ev_row = np.zeros(tbl_len, np.float32)
            ev_row[: len(ev_pad)] = ev_pad
            def padded(a):
                out = np.zeros(tbl_len, np.float32)
                out[: len(a)] = a
                return out
            evs.append(ev_row)
            gms.append(padded(gm))
            stds.append(padded(ls[ranks_pad]))
            lstds.append(padded(lls[ranks_pad]))
            lps.append(lp_consts)
            kranks.append(kmer_ranks)
            ne_v.append(len(event_means_list[i]))
            nk_v.append(len(sequences[i]) - k + 1)

        dev_traces = abea_fill_bands_pallas(
            jnp.asarray(np.stack(evs)), jnp.asarray(np.stack(gms)),
            jnp.asarray(np.stack(stds)), jnp.asarray(np.stack(lstds)),
            jnp.asarray(np.array(ne_v, np.int32)),
            jnp.asarray(np.array(nk_v, np.int32)),
            jnp.asarray(np.stack(lps)), jnp.asarray(trim_tbl),
            n_bands=n_bands, tbl_len=tbl_len, bandwidth=bw,
        )
        dev_walk = None
        if device_walk:
            # on-device traceback: the 32-byte trace rows stay in HBM;
            # only the seed + packed 2-bit move strings come back
            dev_walk = abea_walk_pallas(
                dev_traces,
                jnp.asarray(np.array(ne_v, np.int32)),
                jnp.asarray(np.array(nk_v, np.int32)),
                n_bands=n_bands, bandwidth=bw)
        pending.append((idxs, dev_traces, dev_walk, ne_v, nk_v, kranks))

    # phase 2: decode per group.  device_walk fetches only the move
    # strings; the legacy path fetches + unpacks the packed trace rows.
    half = bw // 2
    for idxs, dev_traces, dev_walk, ne_v, nk_v, kranks in pending:
        if dev_walk is not None:
            walk_b = np.asarray(dev_walk)
            for row, i in enumerate(idxs):
                results[i] = _decode_walk_read(
                    walk_b[row], sequences[i],
                    np.asarray(event_means_list[i], np.float32), model,
                    float(np.float32(scales[i])),
                    float(np.float32(shifts[i])), kranks[row], k)
            continue
        traces_b = np.asarray(dev_traces)
        moves_g, bes_g, lv_g = [], [], []
        for row in range(len(idxs)):
            nb = ne_v[row] + nk_v[row] + 2
            cells = unpack_trace_rows(traces_b[row][: nb - 2])
            rights = cells[:, bw].astype(np.int64)
            # reconstruct band positions from the decision bits
            cum_r = np.cumsum(rights)
            bes_g.append(half + np.arange(1, nb - 1) - cum_r)
            # f32 last_vals from the 2-bit pieces
            lv_bits = np.zeros(nb - 2, np.uint32)
            for t in range(16):
                lv_bits |= cells[:, LV_LANE0 + t].astype(np.uint32) << np.uint32(2 * t)
            lv_g.append(lv_bits.view(np.float32).astype(np.float64))
            moves_g.append(cells[:, :bw])
        group_res = A._traceback_batch(
            [sequences[i] for i in idxs],
            [event_means_list[i] for i in idxs], model,
            [float(np.float32(scales[i])) for i in idxs],
            [float(np.float32(shifts[i])) for i in idxs],
            moves_g, bes_g, lv_g, kranks, bw, k)
        for row, i in enumerate(idxs):
            results[i] = group_res[row]
    return results


# ---------------------------------------------------------------------------
# On-device traceback: packed trace rows never leave HBM.  The backtrack
# visits bands in strictly DECREASING order (every move lowers
# band = ei+ki+2 by 1 or 2), so the walk is a reverse sweep over the
# trace rows with scalar state; the device emits the seed event plus the
# 2-bit MOVE sequence, and the host replays it linearly (keeping the C's
# f64 emission-sum QC bit-exact) without fetching the 32-byte trace rows
# (the relay fetch that bounded abea at ~213 reads/s).
# ---------------------------------------------------------------------------


def _walk_kernel(params, trace_ref, ne_ref, nk_ref, ce0_ref, tr_ref,
                 out_ref, rights_scr, st_ref):
    bw, n_wcap, chunk, n_chunks = params
    half = bw // 2
    r8 = pl.program_id(0) % 8
    rc = n_chunks - 1 - pl.program_id(1)  # chunks visit bands in reverse
    n_events = ne_ref[r8, 0]
    n_kmers = nk_ref[r8, 0]
    ce0 = ce0_ref[r8, 0]  # seed event, computed in XLA (see wrapper)
    nb = n_events + n_kmers + 2
    # trace rows arrive as i32 WORDS (bitcast outside the kernel): a u8
    # block this large hits a Mosaic conversion bug (bytes 16..18 of late
    # rows read as zero), so bytes are carved out of words with shifts.
    # NOTE a second Mosaic bug: OR-chaining many static 2-bit extracts
    # from one lane zeroes the shift-6/14/22 pieces when n_rows >= 512
    # (shift-30 survives) — so the multi-piece last-val decode and the
    # seed argmax moved OUT of the kernel; only single-piece extracts
    # (verified clean at any size) remain here.
    rows = trace_ref[0]  # [chunk, 8] i32 words (32 bytes LE)
    l_iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = jnp.zeros((n_wcap, 1), jnp.int32)
        st_ref[0] = n_kmers - 1                      # ck
        st_ref[1] = ce0                              # ce
        st_ref[2] = ce0 + n_kmers - 1 + 2            # bi
        # bll_e of band nb-1; total rights precomputed in XLA
        st_ref[3] = half + (nb - 2) - tr_ref[r8, 0]  # be
        st_ref[4] = 0                                # cnt
        st_ref[5] = 0                                # mv_word

    # the down/right decision bit of each band lives at cell bw
    r_byte = bw & 31
    rights_scr[:, :] = (jax.lax.shift_right_logical(
        rows[:, r_byte >> 2 : (r_byte >> 2) + 1],
        8 * (r_byte & 3) + 2 * (bw >> 5)) & 3)

    def body(t, st):
        band = rc * chunk + chunk + 1 - t  # descending over this chunk
        ck, ce, bi, be, cnt, mv_word = st
        in_range = (band >= 2) & (band < nb)
        r_loc = jnp.clip(band - 2 - rc * chunk, 0, chunk - 1)
        right = jnp.where(
            in_range, rights_scr[pl.ds(r_loc, 1), :][0, 0], 0)
        consume = in_range & (band == bi) & (ck >= 0) & (ce >= 0)
        offset = be - ce
        row = trace_ref[0, pl.ds(r_loc, 1), :]  # [1, 8] i32 words
        off = jnp.clip(offset, 0, 127)
        byte = off & 31
        # cell off: byte off&31 (word byte>>2, lane-local byte byte&3),
        # 2-bit piece (off>>5) within the byte
        shift = 8 * (byte & 3) + 2 * jax.lax.shift_right_logical(off, 5)
        # one-lane masked SUM (not max: i32 words can be negative)
        val = jnp.sum(jnp.where(
            l_iota8 == jax.lax.shift_right_logical(byte, 2), row, 0))
        move = jnp.where(consume,
                         jax.lax.shift_right_logical(val, shift) & 3, 0)
        # pack 2-bit moves 16-per-word in a scalar carry; flush full words
        bit = 2 * (cnt & 15)
        mv_word = jnp.where(consume, mv_word | (move << bit), mv_word)
        flush = consume & ((cnt & 15) == 15)
        word_idx = jax.lax.shift_right_logical(cnt, 4)

        @pl.when(flush)
        def _store():
            out_ref[pl.ds(0, 1), pl.ds(word_idx, 1), 0:1] = jnp.full(
                (1, 1, 1), mv_word, jnp.int32)

        mv_word = jnp.where(flush, 0, mv_word)
        d_ck = jnp.where(consume & ((move == 0) | (move == 2)), 1, 0)
        d_ce = jnp.where(consume & ((move == 0) | (move == 1)), 1, 0)
        d_bi = jnp.where(consume, jnp.where(move == 0, 2, 1), 0)
        cnt = cnt + consume.astype(jnp.int32)
        be = be - jnp.where(in_range, 1 - right, 0)
        return (ck - d_ck, ce - d_ce, bi - d_bi, be, cnt, mv_word)

    st = (st_ref[0], st_ref[1], st_ref[2], st_ref[3], st_ref[4], st_ref[5])
    ck, ce, bi, be, cnt, mv_word = jax.lax.fori_loop(0, chunk, body, st)
    st_ref[0] = ck
    st_ref[1] = ce
    st_ref[2] = bi
    st_ref[3] = be
    st_ref[4] = cnt
    st_ref[5] = mv_word

    @pl.when(pl.program_id(1) == n_chunks - 1)
    def _fin():
        # final partial word + meta rows
        @pl.when((cnt & 15) != 0)
        def _tail():
            out_ref[pl.ds(0, 1),
                    pl.ds(jax.lax.shift_right_logical(cnt, 4), 1), 0:1] = (
                jnp.full((1, 1, 1), mv_word, jnp.int32))

        # meta rows: move count and seed event (vector-shaped stores —
        # Mosaic rejects scalar stores to VMEM)
        out_ref[pl.ds(0, 1), pl.ds(n_wcap - 1, 1), 0:1] = jnp.full(
            (1, 1, 1), cnt, jnp.int32)
        out_ref[pl.ds(0, 1), pl.ds(n_wcap - 2, 1), 0:1] = jnp.full(
            (1, 1, 1), ce0, jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_bands", "bandwidth",
                                             "chunk_rows"))
def abea_walk_pallas(packed_traces, n_events, n_kmers,
                     n_bands: int, bandwidth: int = ALN_BANDWIDTH,
                     chunk_rows: int = CHUNK_ROWS):
    """Reverse-sweep traceback on device.

    packed_traces: [B, n_bands-2, LANES//4] u8 (abea_fill_bands_pallas
    output, left on device).  Returns [B, n_wcap] i32: words of packed
    2-bit moves, with the move count at row -1 and the seed event index
    at row -2 (n_wcap ~ n_rows/16 — the fetch is 16x smaller than the
    move count's row range).

    Long reads stream the trace rows chunk-by-chunk in REVERSE band
    order (grid minor axis); the walk's six scalars persist in SMEM
    scratch across a read's chunk steps.
    """
    b = packed_traces.shape[0]
    n_rows = n_bands - 2
    chunk = min(chunk_rows, _round_up(n_rows, 8))
    n_chunks = -(-n_rows // chunk)
    b8 = _round_up(b, 8)
    # bitcast the u8 rows to little-endian i32 words OUTSIDE pallas (a u8
    # VMEM block this large trips a Mosaic conversion bug zeroing bytes)
    trace_words = jax.lax.bitcast_convert_type(
        packed_traces.reshape(b, n_rows, LANES // 16, 4), jnp.int32)

    # per-read total of the down/right decision bits (cell bw), needed by
    # the kernel for be_top BEFORE any chunk is walked — computed here in
    # XLA over the whole row range
    r_byte = bandwidth & 31
    rights_all = jax.lax.shift_right_logical(
        trace_words[:, :, r_byte >> 2],
        8 * (r_byte & 3) + 2 * (bandwidth >> 5)) & 3
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    nb_read = (n_events.astype(jnp.int32)
               + n_kmers.astype(jnp.int32))[:, None]
    total_rights = jnp.sum(
        jnp.where(row_ids < nb_read, rights_all, 0), axis=1,
        dtype=jnp.int32)[:, None]

    # seed (align.c:417-433): first event index maximizing
    # fl32(f64(lv[bi-2]) + rem_trim), bi = ei + n_kmers + 1.  Computed
    # HERE in XLA — the in-kernel multi-piece lv decode miscompiles at
    # production n_rows (see _walk_kernel note).  lv bits are cells
    # 104..119 = bits 6-7 of bytes 8..23; the trim remainder arrives as
    # a two-float split and is added with a compensated (2Sum) sum to
    # reproduce the C's double add with a single f32 round.
    lv_bits = jnp.zeros((b, n_rows), jnp.int32)
    for t in range(16):
        w = 2 + t // 4  # byte 8+t lives in word (8+t)//4
        piece = jax.lax.shift_right_logical(
            trace_words[:, :, w], 8 * (t & 3) + 6) & 3
        lv_bits = lv_bits | (piece << (2 * t))
    lv = jax.lax.bitcast_convert_type(lv_bits, jnp.float32)
    # trim remainder (n_events - ei) * lp_trim two-float split: depends
    # only on the integer n = ne + nk - 1 - row, so it is a reversed
    # slice of a small constant table (baked at trace time — no host
    # staging or per-group device_put)
    tab_n = np.arange(n_bands, dtype=np.float64) * float(np.log(0.01))
    tab_hi_np = tab_n.astype(np.float32)
    tab_lo_np = (tab_n - tab_hi_np.astype(np.float64)).astype(np.float32)
    nidx = jnp.clip((n_events.astype(jnp.int32) + n_kmers.astype(jnp.int32)
                     - 1)[:, None] - jnp.arange(n_rows, dtype=jnp.int32)[None, :],
                    0, n_bands - 1)
    t_hi = jnp.asarray(tab_hi_np)[nidx]
    t_lo = jnp.asarray(tab_lo_np)[nidx]
    s1 = lv + t_hi
    bb = s1 - lv
    err = (lv - (s1 - bb)) + (t_hi - bb)
    s_val = s1 + (err + t_lo)
    s_val = jnp.where(jnp.isneginf(lv), lv, s_val)
    ne_c = n_events.astype(jnp.int32)[:, None]
    nk_c = n_kmers.astype(jnp.int32)[:, None]
    row_i = jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    ei_of_row = row_i - (nk_c - 1)
    seed_ok = (ei_of_row >= 0) & (ei_of_row < ne_c) & (row_i < ne_c + nk_c)
    s_val = jnp.where(seed_ok, s_val, -jnp.inf)
    s_max = jnp.max(s_val, axis=1, keepdims=True)
    first = jnp.min(jnp.where((s_val == s_max) & seed_ok,
                              ei_of_row, jnp.int32(1 << 30)), axis=1)
    ce0 = jnp.where(jnp.isinf(s_max[:, 0]), 0, first).astype(jnp.int32)

    def padrow(a, dt=None):
        if b8 == b:
            return a
        pad = jnp.zeros((b8 - b,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    smem_row = pl.BlockSpec((8, 1), lambda i, c: (i // 8, 0),
                            memory_space=pltpu.SMEM)
    n_wcap = _round_up(n_rows // 16 + 3, 8)
    rows_pad = n_chunks * chunk
    tw = padrow(trace_words)
    if rows_pad != n_rows:
        tw = jnp.concatenate(
            [tw, jnp.zeros((b8, rows_pad - n_rows, LANES // 16),
                           jnp.int32)], axis=1)
    out = pl.pallas_call(
        functools.partial(_walk_kernel,
                          (bandwidth, n_wcap, chunk, n_chunks)),
        grid=(b8, n_chunks),
        in_specs=[pl.BlockSpec((1, chunk, LANES // 16),
                               lambda i, c: (i, n_chunks - 1 - c, 0),
                               memory_space=pltpu.VMEM),
                  smem_row, smem_row, smem_row, smem_row],
        out_specs=pl.BlockSpec((1, n_wcap, 1), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n_wcap, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((chunk, 1), jnp.int32),
                        pltpu.SMEM((6,), jnp.int32)],
    )(tw,
      padrow(n_events[:, None].astype(jnp.int32)),
      padrow(n_kmers[:, None].astype(jnp.int32)),
      padrow(ce0[:, None]),
      padrow(total_rights))
    return out[:b, :, 0]


def _walk_trim_splits(n_rows, ne, nk):
    """Two-float f32 split of the C's double (n_events - ei) * lp_trim,
    pre-shifted to trace-row order (row r <-> event r - (n_kmers - 1))."""
    lp_trim = np.log(0.01)
    ei = np.arange(n_rows, dtype=np.float64) - (nk - 1)
    rem = (ne - ei) * lp_trim
    hi = rem.astype(np.float32)
    lo = (rem - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _decode_walk_read(out_row, sequence, event_means, model, scale, shift,
                      kranks, k):
    """Replay the device-walk move string into pairs + the C's f64 QC
    (postalign semantics, align.c:443-548) — linear, no trace rows."""
    from .oracle import abea as oracle

    n_rows = len(out_row)
    cnt = int(out_row[n_rows - 1])
    ce0 = int(out_row[n_rows - 2])
    nk = len(sequence) - k + 1
    ne = len(event_means)
    if cnt <= 0:
        return []
    words = np.asarray(out_row[: (cnt + 15) // 16], np.uint32)
    idx = np.arange(cnt)
    moves = (words[idx >> 4] >> (2 * (idx & 15)).astype(np.uint32)) & 3
    d_ck = ((moves == 0) | (moves == 2)).astype(np.int64)
    d_ce = ((moves == 0) | (moves == 1)).astype(np.int64)
    cks = (nk - 1) - np.concatenate([[0], np.cumsum(d_ck)[:-1]])
    ces = ce0 - np.concatenate([[0], np.cumsum(d_ce)[:-1]])

    lm, ls, lls = (model["level_mean"], model["level_stdv"],
                   model["level_log_stdv"])
    ranks = np.asarray(kranks)[cks]
    em = oracle.log_prob_match(
        lm[ranks], ls[ranks], lls[ranks],
        np.asarray(event_means, np.float32)[ces], scale, shift)
    # the C accumulates the f32 emissions sequentially in double, in walk
    # order — np.cumsum is sequential in order, unlike np.sum's pairwise
    sum_emission = float(np.cumsum(np.asarray(em, np.float64))[-1])
    avg = sum_emission / max(cnt, 1)

    is_l = moves == 2
    max_gap = 0
    if is_l.any():
        # longest run of FROM_L moves
        edges = np.diff(np.concatenate([[0], is_l.view(np.int8), [0]]))
        starts = np.nonzero(edges == 1)[0]
        ends = np.nonzero(edges == -1)[0]
        max_gap = int((ends - starts).max())

    out = list(zip(cks.tolist(), ces.tolist()))[::-1]
    spanned = bool(out) and out[0][0] == 0 and out[-1][0] == nk - 1
    if avg < -5.0 or not spanned or max_gap > 50:
        return []
    return out
