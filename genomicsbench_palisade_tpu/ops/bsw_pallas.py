"""Pallas TPU kernel for banded Smith-Waterman extension (ksw_extend).

The jnp scan (ops/bsw.py bsw_batch) is HBM-bound: every target row
round-trips the [B, Qe] H/E carries plus temporaries through HBM.  This
kernel keeps everything VMEM-resident per 128-lane batch tile and walks
all target rows inside one pallas_call, mirroring ops/phmm_pallas.py.

Layout: query positions on the SUBLANE axis ([Qe_pad, 128] tiles), pairs
on lanes.  The F-chain running max (lazy-F cummax identity, see
ops/bsw.py docstring) becomes log2(Qe) masked sublane-roll/max rounds.
Row scalars (band, running max, gscore, ...) are [128] i32 loop carries
that live in vector registers.

Bit-identical to bsw_batch (same int32 op order); verified by
tests/test_bsw_pallas.py against the oracle and the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsw import _params_tuple, DEFAULT_PARAMS

NEG = -(1 << 20)  # python int: jnp constants would be captured tracers in the kernel

LANE_TILE = 128


def _kernel(params, q_codes_ref, target_ref, h_init_ref, e_init_ref,
            qlen_ref, tlen_ref, h0_ref, w_ref, out_ref, h_ref, e_ref):
    o_del, e_del, o_ins, e_ins, zdrop, end_bonus, match, mismatch, ambig, _w0 = params
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qe_pad, bt = q_codes_ref.shape
    tp = target_ref.shape[0]

    q_codes = q_codes_ref[:]
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (qe_pad, bt), 0)
    neg = jnp.full((qe_pad, bt), NEG, jnp.int32)

    qlen = qlen_ref[0, :]  # [Bt]
    tlen = tlen_ref[0, :]
    h0 = h0_ref[0, :]
    w = w_ref[0, :]

    log_rounds = max(int(np.ceil(np.log2(qe_pad))), 1)
    # j-bits for the packed (h_row << JB) | j max-reduce; scores already
    # assume |value| < 2^20 (the NEG sentinel), so the shift stays in i32
    jb = max(int(np.ceil(np.log2(qe_pad))), 1)
    jmask = (1 << jb) - 1

    # loop-invariant hoists: the cummax round masks and the iota*e_ins
    # products are computed ONCE before the row loop (Mosaic compiles the
    # fori_loop body as written — no loop-invariant code motion)
    roll_masks = [j_iota >= (1 << k) for k in range(log_rounds)]
    j_e_ins = j_iota * e_ins
    jm1_e_ins = (j_iota - 1) * e_ins

    def cummax_sub(g):
        # inclusive running max down the sublane axis
        for k in range(log_rounds):
            g = jnp.where(roll_masks[k],
                          jnp.maximum(g, pltpu.roll(g, 1 << k, axis=0)), g)
        return g

    def body(i, st):
        (beg0, end0, alive32, mmax, max_i, max_j, max_ie, gscore,
         max_off) = st
        alive = alive32 != 0  # i32 carry: Mosaic rejects i1 vector carries
        h = h_ref[:]
        e = e_ref[:]
        act = alive & (i < tlen)
        beg = jnp.maximum(beg0, i - w)
        end = jnp.minimum(jnp.minimum(end0, i + w + 1), qlen)
        h1_pre = jnp.where(
            beg == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0
        )  # [Bt]

        t_char = target_ref[pl.ds(jnp.minimum(i, tp - 1), 1), :]  # [1, Bt]
        # codes are 0..3 bases, 4 ambiguous, 5 query pad: (q|t) >= 4 iff
        # either operand >= 4 (bit 2 set), one op cheaper than two compares
        qsc = jnp.where(
            (t_char | q_codes) >= 4,
            jnp.int32(ambig),
            jnp.where(q_codes == t_char, jnp.int32(match), jnp.int32(-mismatch)),
        )

        ge_beg = j_iota >= beg[None, :]
        le_end = j_iota <= end[None, :]
        in_band = ge_beg & (j_iota < end[None, :])
        band_cl = ge_beg & le_end  # closed band [beg, end]

        m_val = jnp.where(h != 0, h + qsc, 0)
        h0_val = jnp.maximum(m_val, e)
        c = jnp.maximum(m_val - oe_ins, 0)
        g = jnp.where(in_band, c + j_e_ins, neg)
        gmax = cummax_sub(g)
        gsh = jnp.where(j_iota == 0, NEG, pltpu.roll(gmax, 1, axis=0))
        # out-of-band gsh is exactly NEG, and banded values are >= 0, so
        # the max-with-0 already zeroes the NEG case (no extra guard)
        f = jnp.maximum(gsh - jm1_e_ins, 0)
        h_row = jnp.maximum(h0_val, f)
        e_next = jnp.maximum(e - e_del, jnp.maximum(m_val - oe_del, 0))

        # row max + argmax in ONE masked reduce: h_row >= 0, so the max of
        # (h_row << jb) | j is (max h, largest j achieving it) — identical
        # to the separate max + masked-argmax (which also tie-broke by
        # largest j); empty band gives -1 -> m = 0, mj = -1
        packed = jnp.where(in_band, (h_row << jb) | j_iota, -1)
        pmax = jnp.max(packed, axis=0)  # [Bt]
        m = jnp.maximum(pmax >> jb, 0)
        mj = jnp.where(pmax < 0, -1, pmax & jmask)

        h1_idx = jnp.maximum(end - 1, 0)
        h1_fin = jnp.max(jnp.where(j_iota == h1_idx[None, :], h_row, NEG), axis=0)
        h1_fin = jnp.where(end > beg, h1_fin, h1_pre)

        # row shift: the wrapped top row lands at j=0, which is either
        # overwritten by the j==beg select (beg==0) or outside upd (beg>0)
        h_shift = pltpu.roll(h_row, 1, axis=0)
        cand_h = jnp.where(j_iota == beg[None, :], h1_pre[None, :], h_shift)
        upd = band_cl & act[None, :]
        h_new = jnp.where(upd, cand_h, h)
        cand_e = jnp.where(j_iota == end[None, :], 0, e_next)
        e_new = jnp.where(upd, cand_e, e)

        g_upd = act & (end == qlen) & (gscore <= h1_fin)
        max_ie = jnp.where(g_upd, i, max_ie)
        gscore = jnp.where(g_upd, h1_fin, gscore)

        # pure boolean algebra (Mosaic can't lower selects on 1-D i1 vectors)
        alive = alive & ((m != 0) | ~act)
        act2 = act & (m != 0)

        improve = act2 & (m > mmax)
        new_max = jnp.where(improve, m, mmax)
        new_max_i = jnp.where(improve, i, max_i)
        new_max_j = jnp.where(improve, mj, max_j)
        max_off = jnp.where(
            improve, jnp.maximum(max_off, jnp.abs(mj - i)), max_off
        )
        di = i - max_i
        dj = mj - max_j
        d_gt = di > dj
        zd = (d_gt & (mmax - m - (di - dj) * e_del > zdrop)) | (
            ~d_gt & (mmax - m - (dj - di) * e_ins > zdrop)
        )
        zbreak = act2 & ~improve & (zdrop > 0) & zd
        alive = alive & ~zbreak
        mmax, max_i, max_j = new_max, new_max_i, new_max_j

        # band shrink: both nz scans share the closed-band mask.  The
        # first-nz scan may include j==end (it can only ever produce its
        # own default `end` there), and the last-nz scan over [beg_n, end]
        # equals the scan over [beg, end] (no nz exists in [beg, beg_n));
        # its empty-mask default beg_n-1 is restored by the final maximum.
        nz_mask = band_cl & ((h_new | e_new) != 0)
        j_or_end = jnp.where(nz_mask, j_iota, end[None, :])
        first_nz = jnp.min(j_or_end, axis=0)
        last_raw = jnp.max(jnp.where(nz_mask, j_iota, -1), axis=0)
        beg_n = first_nz
        last_nz = jnp.maximum(last_raw, beg_n - 1)
        end_n = jnp.minimum(last_nz + 2, qlen)

        upd_band = act2 & ~zbreak
        beg_out = jnp.where(upd_band, beg_n, beg)
        end_out = jnp.where(upd_band, end_n, end)
        beg_out = jnp.where(act, beg_out, beg0)
        end_out = jnp.where(act, end_out, end0)

        h_ref[:] = h_new
        e_ref[:] = e_new
        return (beg_out, end_out, alive.astype(jnp.int32), mmax, max_i,
                max_j, max_ie, gscore, max_off)

    zero = jnp.zeros((bt,), jnp.int32)
    h_ref[:] = h_init_ref[:]
    e_ref[:] = e_init_ref[:]
    st = (
        zero,
        qlen,
        jnp.ones((bt,), jnp.int32),
        h0,
        jnp.full((bt,), -1, jnp.int32),
        jnp.full((bt,), -1, jnp.int32),
        jnp.full((bt,), -1, jnp.int32),
        jnp.full((bt,), -1, jnp.int32),
        zero,
    )
    # NB: a 2-step unroll (body2 calling body twice) crashes the Mosaic
    # layout inferer on the 1-D [Bt] carries ("layout.h:320 Check failed:
    # arr.size() >= layout_rank").  Reworking the carries to [1, Bt] rows
    # makes the unroll compile but measures NO faster (7.16 vs 6.98 ms on
    # 8192 pairs): the ~0.44 us/step average is real vector work on the
    # [Qe, Bt] tiles, not loop overhead.  Keep the plain loop.
    st = jax.lax.fori_loop(0, tp, body, st)
    (_b, _e2, _al, mmax, max_i, max_j, max_ie, gscore, max_off) = st
    out = jnp.stack(
        [mmax, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off,
         zero, zero], axis=0
    )
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("params", "lane_tile"))
def bsw_batch_pallas(batch, params=_params_tuple(DEFAULT_PARAMS),
                     lane_tile: int = LANE_TILE):
    """Drop-in replacement for bsw_batch (same outputs, VMEM-resident)."""
    return _bsw_core(
        batch["query"].astype(jnp.int32),
        batch["target"].astype(jnp.int32),
        batch["qlen"].astype(jnp.int32),
        batch["tlen"].astype(jnp.int32),
        batch["h0"].astype(jnp.int32),
        params, lane_tile)


def pack_codes_2bit(codes):
    """Host-side 2-bit pack: [n, L] uint8 base codes in 0..3 (pad slots 0),
    L % 4 == 0, -> [n, L//4] uint8 wire bytes (little-endian within the
    byte).  The axon relay moves ~70 MB/s, so at the reference's
    bsw_large scale (10.6M pairs, scripts/bsw_large:5-8) raw int8
    sequence bytes dominate end-to-end wall; this quarters them."""
    n, L = codes.shape
    assert L % 4 == 0, L
    b = (codes[:, 0::4] | (codes[:, 1::4] << 2)
         | (codes[:, 2::4] << 4) | (codes[:, 3::4] << 6))
    return np.ascontiguousarray(b, dtype=np.uint8)


def _unpack2(packed, length, nlen, fill=4):
    """Device-side inverse of pack_codes_2bit: -> [n, length] i32 codes,
    positions >= nlen restored to the kernel's pad value (bit-exact
    reconstruction of the raw padded array)."""
    shifts = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    codes = ((packed[:, :, None] >> shifts[None, None, :])
             & jnp.uint8(3)).reshape(packed.shape[0], -1)
    codes = codes[:, :length].astype(jnp.int32)
    j = jnp.arange(length, dtype=jnp.int32)[None, :]
    return jnp.where(j < nlen[:, None], codes, jnp.int32(fill))


@functools.partial(jax.jit,
                   static_argnames=("q_pad", "t_pad", "params", "lane_tile"))
def bsw_batch_pallas_packed(batch, q_pad, t_pad,
                            params=_params_tuple(DEFAULT_PARAMS),
                            lane_tile: int = LANE_TILE):
    """bsw_batch_pallas with the 2-bit packed wire format: batch carries
    "qpack"/"tpack" ([B, pad//4] uint8 from pack_codes_2bit) instead of
    raw code arrays; the unpack runs on device inside the same jit."""
    qlen = batch["qlen"].astype(jnp.int32)
    tlen = batch["tlen"].astype(jnp.int32)
    return _bsw_core(
        _unpack2(batch["qpack"], q_pad, qlen),
        _unpack2(batch["tpack"], t_pad, tlen),
        qlen, tlen, batch["h0"].astype(jnp.int32),
        params, lane_tile)


OUT_ORDER = ("score", "qle", "tle", "gtle", "gscore", "max_off")


@functools.partial(
    jax.jit, static_argnames=("q_pad", "t_pad", "params", "lane_tile",
                              "narrow"))
def bsw_batch_pallas_packed_stacked(batch, q_pad, t_pad,
                                    params=_params_tuple(DEFAULT_PARAMS),
                                    lane_tile: int = LANE_TILE,
                                    narrow: bool = False):
    """Packed-wire kernel returning ONE stacked [6, B] device array
    (OUT_ORDER rows) instead of a dict: the dataset-scale driver fetches
    one object per dispatch, and stacking inside the jit avoids 6 eager
    slice dispatches per chunk through the relay.  With narrow=True the
    stack is cast to int16 before the fetch — callers prove the bound
    (max |h0| + q_pad*match plus index fields <= t_pad) fits, halving
    fetch bytes on the ~70 MB/s relay."""
    qlen = batch["qlen"].astype(jnp.int32)
    tlen = batch["tlen"].astype(jnp.int32)
    out = _bsw_core(
        _unpack2(batch["qpack"], q_pad, qlen),
        _unpack2(batch["tpack"], t_pad, tlen),
        qlen, tlen, batch["h0"].astype(jnp.int32),
        params, lane_tile)
    arr = jnp.stack([out[k] for k in OUT_ORDER])
    return arr.astype(jnp.int16) if narrow else arr


@functools.partial(jax.jit,
                   static_argnames=("params", "lane_tile", "narrow"))
def bsw_batch_pallas_stacked(batch, params=_params_tuple(DEFAULT_PARAMS),
                             lane_tile: int = LANE_TILE,
                             narrow: bool = False):
    """Raw-codes variant of bsw_batch_pallas_packed_stacked (fallback for
    chunks containing ambiguous bases, which the 2-bit wire can't carry)."""
    out = _bsw_core(
        batch["query"].astype(jnp.int32),
        batch["target"].astype(jnp.int32),
        batch["qlen"].astype(jnp.int32),
        batch["tlen"].astype(jnp.int32),
        batch["h0"].astype(jnp.int32),
        params, lane_tile)
    arr = jnp.stack([out[k] for k in OUT_ORDER])
    return arr.astype(jnp.int16) if narrow else arr


def _bsw_core(query, target, qlen, tlen, h0, params, lane_tile):
    o_del, e_del, o_ins, e_ins, zdrop, end_bonus, match, mismatch, ambig, w0 = params
    oe_ins = o_ins + e_ins

    b, qp = query.shape
    tp = target.shape[1]
    qe = qp + 1
    qe_pad = -(-qe // 8) * 8
    assert b % lane_tile == 0, (b, lane_tile)

    j_iota = jnp.arange(qe, dtype=jnp.int32)[None, :]
    max_sc = match
    max_ins = jnp.maximum(
        ((qlen * max_sc + end_bonus - o_ins).astype(jnp.float32) / e_ins + 1.0)
        .astype(jnp.int32), 1)
    max_del = jnp.maximum(
        ((qlen * max_sc + end_bonus - o_del).astype(jnp.float32) / e_del + 1.0)
        .astype(jnp.int32), 1)
    w = jnp.minimum(jnp.minimum(w0, max_ins), max_del)

    decay = h0[:, None] - oe_ins - (j_iota - 1) * e_ins
    prev_h = h0[:, None] - oe_ins - (j_iota - 2) * e_ins
    write = (j_iota <= 1) | ((prev_h > e_ins) & (j_iota <= qlen[:, None]))
    h_init = jnp.where(write, jnp.maximum(decay, 0), 0)
    h_init = jnp.where(j_iota == 0, h0[:, None], h_init)
    h_init = jnp.where(
        (j_iota == 1) & (1 <= qlen[:, None]),
        jnp.maximum(h0[:, None] - oe_ins, 0), h_init)

    q_codes = jnp.concatenate([query, jnp.full((b, 1), 4, jnp.int32)], axis=1)

    def pad_q(a, fill):
        return jnp.pad(a, ((0, 0), (0, qe_pad - qe)), constant_values=fill)

    args = [
        pad_q(q_codes, 5).T,          # [Qe_pad, B]; pad rows never in band
        target.T,                     # [Tp, B]
        pad_q(h_init, 0).T,
        jnp.zeros((qe_pad, b), jnp.int32),
        qlen[None, :],
        tlen[None, :],
        h0[None, :],
        w[None, :],
    ]

    grid = (b // lane_tile,)

    def col_spec(rows):
        return pl.BlockSpec((rows, lane_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, params),
        grid=grid,
        in_specs=[col_spec(qe_pad), col_spec(tp), col_spec(qe_pad),
                  col_spec(qe_pad)] + [col_spec(1)] * 4,
        out_specs=col_spec(8),
        out_shape=jax.ShapeDtypeStruct((8, b), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((qe_pad, lane_tile), jnp.int32),  # h
            pltpu.VMEM((qe_pad, lane_tile), jnp.int32),  # e
        ],
        cost_estimate=pl.CostEstimate(
            flops=40 * b * qe_pad * tp, bytes_accessed=10 * b * qe_pad * 4,
            transcendentals=0,
        ),
    )(*args)
    return {
        "score": out[0],
        "qle": out[1],
        "tle": out[2],
        "gtle": out[3],
        "gscore": out[4],
        "max_off": out[5],
    }
