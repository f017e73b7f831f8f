"""Pallas TPU kernel for the PairHMM forward pass.

The pure-JAX scan (ops/phmm.py) is HBM-bound: every diagonal step round-
trips six [B, R] carries through HBM (~40 MB/step).  This kernel keeps the
whole wavefront state in VMEM and walks all diagonals inside one
pallas_call per batch tile, so HBM sees each input exactly once.

Layout: rows on the SUBLANE axis, batch on the LANE axis — [Rp, Bt] tiles
with Bt=128 lanes.  The diagonal shift (r -> r-1) is then a sublane roll,
and the per-diagonal hap character stream is maintained incrementally:

    hap_diag(d)[r] = hap[d-r-1]  =  shift_down(hap_diag(d-1)) with
                                    hap[d-1] inserted at row 0

so no lane-axis dynamic slicing ever happens.  Per-testcase result
accumulation uses a precomputed row-selector mask (row == rslen) instead
of a gather.

Semantics identical to ops.phmm.phmm_forward (same float association,
masking, and fallback contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phmm import _tables_f32, _row_probs, AMBIG, MIN_ACCEPTED

LANE_TILE = 128


def _kernel(
    stripes,
    p_mm_ref,
    p_gapm_ref,
    p_mx_ref,
    p_xx_ref,
    p_my_ref,
    p_yy_ref,
    one_m_distm_ref,
    distm3_ref,
    rs_row_ref,
    hap_ref,
    row_sel_ref,
    rslen_ref,
    haplen_ref,
    init_y_ref,
    res_m_ref,
    res_x_ref,
    m1_ref,
    x1_ref,
    y1_ref,
    m2_ref,
    x2_ref,
    y2_ref,
    hapd_ref,
    bm_ref,
    bx_ref,
    by_ref,
):
    rp = p_mm_ref.shape[0]
    bt = m1_ref.shape[1]
    hp = hap_ref.shape[0] - rp  # hap buffer is padded by rp sentinel rows
    hcap = bm_ref.shape[0] - 1  # boundary buffer max index (>= hp + 1)

    init_y = init_y_ref[:]  # [1, Bt]
    rslen = rslen_ref[:]  # [1, Bt] int32
    haplen = haplen_ref[:]

    res_m_ref[:] = jnp.zeros_like(res_m_ref)
    res_x_ref[:] = jnp.zeros_like(res_x_ref)

    # GKL-style stripe decomposition (avx-pairhmm-template.h:209-233):
    # rows split into stripes; each stripe walks its own (shorter)
    # wavefront over all columns, carrying the stripe's last-row M/X/Y
    # values to the next stripe through column-indexed VMEM buffers.
    # Padded cells drop from rp*(rp+hp-1) to rp*(T+hp-1) and every
    # per-step vector op runs on a [T, Bt] tile instead of [Rp, Bt].
    # Single buffer per carry: at local step d the previous stripe's
    # value is read at column d while the current stripe writes column
    # d - (T-1) — the read index stays ahead of the write index, so the
    # rolling overwrite never clobbers an unread value.
    for si, (r0, st) in enumerate(stripes):
        s_first = si == 0
        s_last = si == len(stripes) - 1

        r_iota = jax.lax.broadcasted_iota(jnp.int32, (st, bt), 0)
        row0 = r_iota == 0
        zero = jnp.zeros((st, bt), jnp.float32)

        # stripe-local d = 0 state (cell (r0, col 0) column is all-zero;
        # the global (0,0) Y = init_Y seed applies to stripe 0 only)
        m1_ref[pl.ds(0, st), :] = zero
        x1_ref[pl.ds(0, st), :] = zero
        y1_ref[pl.ds(0, st), :] = (
            jnp.where(row0, init_y, 0.0) if s_first else zero
        )
        m2_ref[pl.ds(0, st), :] = zero
        x2_ref[pl.ds(0, st), :] = zero
        y2_ref[pl.ds(0, st), :] = zero
        hapd_ref[pl.ds(0, st), :] = jnp.full((st, bt), AMBIG + 2, jnp.int32)

        p_mm = p_mm_ref[pl.ds(r0, st), :]
        p_gapm = p_gapm_ref[pl.ds(r0, st), :]
        p_mx = p_mx_ref[pl.ds(r0, st), :]
        p_xx = p_xx_ref[pl.ds(r0, st), :]
        p_my = p_my_ref[pl.ds(r0, st), :]
        p_yy = p_yy_ref[pl.ds(r0, st), :]
        one_m_distm = one_m_distm_ref[pl.ds(r0, st), :]
        distm3 = distm3_ref[pl.ds(r0, st), :]
        rs_row = rs_row_ref[pl.ds(r0, st), :]
        row_sel = row_sel_ref[pl.ds(r0, st), :]
        sel = row_sel > 0.0  # loop-invariant row selector
        rslen_loc = rslen - r0

        def body(d, _, row0=row0, p_mm=p_mm, p_gapm=p_gapm, p_mx=p_mx,
                 p_xx=p_xx, p_my=p_my, p_yy=p_yy, one_m_distm=one_m_distm,
                 distm3=distm3, sel=sel,
                 rslen_loc=rslen_loc, st=st, s_first=s_first,
                 s_last=s_last, rs_row=rs_row):
            m1 = m1_ref[pl.ds(0, st), :]
            x1 = x1_ref[pl.ds(0, st), :]
            y1 = y1_ref[pl.ds(0, st), :]
            m2s = m2_ref[pl.ds(0, st), :]
            x2s = x2_ref[pl.ds(0, st), :]
            y2s = y2_ref[pl.ds(0, st), :]

            # stream the next hap character into row 0 of the diag buffer
            # (hap_ref is padded to rp+hp rows, never-matching sentinel)
            hap_row = hap_ref[pl.ds(d - 1, 1), :]
            hapd = pltpu.roll(hapd_ref[pl.ds(0, st), :], 1, axis=0)
            hapd = jnp.where(row0, hap_row, hapd)
            hapd_ref[pl.ds(0, st), :] = hapd

            # row 0 of each shift takes the previous stripe's last-row
            # value at this column (zero for stripe 0); m2/x2/y2 scratch
            # hold the ALREADY-SHIFTED d-1 arrays cached from last step
            if s_first:
                bm_row = bx_row = by_row = None
            else:
                rd = jnp.minimum(d, hcap)
                bm_row = bm_ref[pl.ds(rd, 1), :]
                bx_row = bx_ref[pl.ds(rd, 1), :]
                by_row = by_ref[pl.ds(rd, 1), :]

            def shift_down(v, ins):
                rolled = pltpu.roll(v, 1, axis=0)
                if ins is None:
                    return jnp.where(row0, 0.0, rolled)
                return jnp.where(row0, ins, rolled)

            m1s = shift_down(m1, bm_row)
            x1s = shift_down(x1, bx_row)
            y1s = shift_down(y1, by_row)

            match = (rs_row == hapd) | (rs_row == AMBIG) | (hapd == AMBIG)
            prior = jnp.where(match, one_m_distm, distm3)

            # no validity mask: with zero (or carried) row-0 inserts,
            # every cell with c <= 0 stays exactly 0 by induction; rows
            # past rslen never flow upward and the result row is gated by
            # cmask below — bit-exactness verified vs the scan
            m_new = prior * ((m2s * p_mm + x2s * p_gapm) + y2s * p_gapm)
            x_new = m1s * p_mx + x1s * p_xx
            y_new = m1 * p_my + y1 * p_yy
            if s_first:
                y_new = jnp.where(row0, init_y, y_new)

            # accumulate last-row M/X: select row rslen, mask column
            # range (TWO accumulators: result = res_m + res_x must match
            # the scan's f32 summation order bit-exactly; only the stripe
            # containing rslen has a nonzero row_sel slice)
            c_at = d - rslen_loc  # [1, Bt]
            cmask = (c_at >= 1) & (c_at <= haplen)
            # NaN-safe gating (jnp.where, matching the scan's extraction):
            # rows past rslen evolve with the padded prob rows' p==1
            # transitions and can overflow to inf/NaN for high-likelihood
            # pairs — multiply-gating (0 * NaN = NaN) poisoned the
            # accumulator, where-gating discards them like the scan does
            res_m_ref[:] = res_m_ref[:] + jnp.where(
                cmask,
                jnp.sum(jnp.where(sel, m_new, 0.0), axis=0, keepdims=True),
                0.0,
            )
            res_x_ref[:] = res_x_ref[:] + jnp.where(
                cmask,
                jnp.sum(jnp.where(sel, x_new, 0.0), axis=0, keepdims=True),
                0.0,
            )

            # carry this stripe's last row to the next stripe (column
            # d-(T-1); clamped writes for d < T-1 land zeros on column 0,
            # whose true state is zero anyway)
            if not s_last:
                wc = jnp.clip(d - (st - 1), 0, hcap)
                bm_ref[pl.ds(wc, 1), :] = m_new[st - 1 : st, :]
                bx_ref[pl.ds(wc, 1), :] = x_new[st - 1 : st, :]
                by_ref[pl.ds(wc, 1), :] = y_new[st - 1 : st, :]

            m2_ref[pl.ds(0, st), :] = m1s
            x2_ref[pl.ds(0, st), :] = x1s
            y2_ref[pl.ds(0, st), :] = y1s
            m1_ref[pl.ds(0, st), :] = m_new
            x1_ref[pl.ds(0, st), :] = x_new
            y1_ref[pl.ds(0, st), :] = y_new
            return ()

        # four diagonals per iteration amortize the fixed per-step cost
        def body4(k, _, body=body):
            body(4 * k + 1, ())
            body(4 * k + 2, ())
            body(4 * k + 3, ())
            body(4 * k + 4, ())
            return ()

        n_d = st + hp - 1
        jax.lax.fori_loop(0, n_d // 4, body4, ())
        for t in range(n_d % 4):
            body(n_d - (n_d % 4) + 1 + t, ())


@functools.partial(jax.jit, static_argnames=("lane_tile", "stripe_height"))
def phmm_forward_pallas(batch, lane_tile: int = LANE_TILE,
                        stripe_height: int | None = None):
    """Drop-in replacement for phmm_forward (same outputs)."""
    ph2pr_np, m2m_np, log10_ic, ic = _tables_f32()
    ph2pr = jnp.asarray(ph2pr_np)
    m2m = jnp.asarray(m2m_np)

    rslen = batch["rslen"].astype(jnp.int32)
    haplen = batch["haplen"].astype(jnp.int32)
    init_y = jnp.float32(ic) / haplen.astype(jnp.float32)

    if "p_mm_t" in batch:
        # host-precomputed transposed rows (prepare_batch): zero XLA prep
        # — the 5 small-table gathers alone cost ~80 ms/call on-device
        rp, b = batch["rs_row_t"].shape
        hp = batch["hap_t"].shape[0] - rp
        row_sel = (jnp.arange(rp, dtype=jnp.int32)[:, None]
                   == rslen[None, :]).astype(jnp.float32)
        distm_t = batch["distm_t"]
        args = [
            batch["p_mm_t"], batch["p_gapm_t"], batch["p_mx_t"],
            batch["p_xx_t"], batch["p_my_t"], batch["p_yy_t"],
            1.0 - distm_t, distm_t / 3.0,
            batch["rs_row_t"], batch["hap_t"], row_sel,
            rslen[None, :], haplen[None, :], init_y[None, :],
        ]
    else:
        rs_row = batch["rs_row"].astype(jnp.int32)
        hap = batch["hap"].astype(jnp.int32)
        b, rp = rs_row.shape
        hp = hap.shape[1]

        p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, distm = _row_probs(
            batch, ph2pr, m2m)
        one_m_distm = 1.0 - distm
        distm3 = distm / 3.0

        row_sel = (
            jnp.arange(rp, dtype=jnp.int32)[None, :] == rslen[:, None]
        ).astype(jnp.float32)

        # transpose to [Rp, B] / [Hp, B] lane-major layout
        def t(x):
            return x.T

        args = [
            t(p_mm),
            t(p_gapm),
            t(p_mx),
            t(p_xx),
            t(p_my),
            t(p_yy),
            t(one_m_distm),
            t(distm3),
            t(rs_row),
            jnp.concatenate(
                [t(hap), jnp.full((rp, b), AMBIG + 2, jnp.int32)], axis=0
            ),
            t(row_sel),
            rslen[None, :],
            haplen[None, :],
            init_y[None, :],
        ]
    assert b % lane_tile == 0, (b, lane_tile)

    grid = (b // lane_tile,)

    def col_spec(rows):
        return pl.BlockSpec(
            (rows, lane_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    # stripe the row axis (GKL pattern): shorter wavefronts over [T, Bt]
    # tiles with a column-indexed carry between stripes
    t_h = stripe_height
    if t_h is None:
        # striping pays off on tall row spaces; small rp gets a single
        # stripe (many-stripe unrolls also inflate Mosaic compile time)
        t_h = 64 if (rp % 64 == 0 and rp >= 128) else rp
    t_h = min(t_h, rp)
    stripes = tuple(
        (r0, min(t_h, rp - r0)) for r0 in range(0, rp, t_h)
    )
    t_max = max(st for _, st in stripes)
    hb = -(-(hp + 2) // 8) * 8  # boundary buffer rows (col 0..hp+1)

    in_specs = (
        [col_spec(rp)] * 9
        + [col_spec(hp + rp)]
        + [col_spec(rp)]
        + [col_spec(1)] * 3
    )
    out_specs = (col_spec(1), col_spec(1))
    res_m, res_x = pl.pallas_call(
        functools.partial(_kernel, stripes),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_max, lane_tile), jnp.float32),  # m1
            pltpu.VMEM((t_max, lane_tile), jnp.float32),  # x1
            pltpu.VMEM((t_max, lane_tile), jnp.float32),  # y1
            pltpu.VMEM((t_max, lane_tile), jnp.float32),  # m2 (shifted)
            pltpu.VMEM((t_max, lane_tile), jnp.float32),  # x2 (shifted)
            pltpu.VMEM((t_max, lane_tile), jnp.float32),  # y2 (shifted)
            pltpu.VMEM((t_max, lane_tile), jnp.int32),  # hap diag stream
            pltpu.VMEM((hb, lane_tile), jnp.float32),  # stripe carry M
            pltpu.VMEM((hb, lane_tile), jnp.float32),  # stripe carry X
            pltpu.VMEM((hb, lane_tile), jnp.float32),  # stripe carry Y
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * b * rp * hp, bytes_accessed=14 * b * rp * 4, transcendentals=0
        ),
    )(*args)

    result = (res_m + res_x)[0]
    fallback = (result < jnp.float32(MIN_ACCEPTED)) | ~jnp.isfinite(result)
    log10 = jnp.log10(result) - jnp.float32(log10_ic)
    return log10, result, fallback
