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
):
    rp, bt = m1_ref.shape
    hp = hap_ref.shape[0] - rp  # hap buffer is padded by rp sentinel rows

    p_mm = p_mm_ref[:]
    p_gapm = p_gapm_ref[:]
    p_mx = p_mx_ref[:]
    p_xx = p_xx_ref[:]
    p_my = p_my_ref[:]
    p_yy = p_yy_ref[:]
    one_m_distm = one_m_distm_ref[:]
    distm3 = distm3_ref[:]
    rs_row = rs_row_ref[:]
    init_y = init_y_ref[:]  # [1, Bt]
    rslen = rslen_ref[:]  # [1, Bt] int32
    haplen = haplen_ref[:]
    row_sel = row_sel_ref[:]  # [Rp, Bt] f32: 1 where r == rslen

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rp, bt), 0)
    row0 = r_iota == 0
    zero = jnp.zeros((rp, bt), jnp.float32)

    # d = 0 state: only cell (0,0) exists with Y = init_Y
    m1_ref[:] = zero
    x1_ref[:] = zero
    y1_ref[:] = jnp.where(row0, init_y, 0.0)
    m2_ref[:] = zero
    x2_ref[:] = zero
    y2_ref[:] = zero
    hapd_ref[:] = jnp.full((rp, bt), AMBIG + 2, jnp.int32)
    res_m_ref[:] = jnp.zeros_like(res_m_ref)
    res_x_ref[:] = jnp.zeros_like(res_x_ref)

    def shift_down(v):
        return jnp.where(row0, 0.0, pltpu.roll(v, 1, axis=0))

    def body(d, _):
        m1 = m1_ref[:]
        x1 = x1_ref[:]
        y1 = y1_ref[:]
        m2 = m2_ref[:]
        x2 = x2_ref[:]
        y2 = y2_ref[:]

        # stream the next hap character into row 0 of the diag buffer
        # (hap_ref is padded to rp+hp rows with a never-matching sentinel)
        hap_row = hap_ref[pl.ds(d - 1, 1), :]
        hapd = pltpu.roll(hapd_ref[:], 1, axis=0)
        hapd = jnp.where(row0, hap_row, hapd)
        hapd_ref[:] = hapd

        # m2/x2/y2 scratch hold the ALREADY-SHIFTED d-2 diagonals (cached
        # from the previous step), so only the d-1 diagonals need rolling
        m1s = shift_down(m1)
        x1s = shift_down(x1)
        y1s = shift_down(y1)
        m2s = m2
        x2s = x2
        y2s = y2

        match = (rs_row == hapd) | (rs_row == AMBIG) | (hapd == AMBIG)
        prior = jnp.where(match, one_m_distm, distm3)

        # no validity mask: with row-0-zeroed shifts, every cell with
        # c <= 0 stays exactly 0 by induction (the only nonzero injection,
        # init_y at row 0, first reaches row r at diagonal d = r, i.e.
        # column 1); rows past rslen never flow upward and the result row
        # is gated by cmask below — bit-exactness verified vs the scan
        m_new = prior * ((m2s * p_mm + x2s * p_gapm) + y2s * p_gapm)
        x_new = m1s * p_mx + x1s * p_xx
        y_new = m1 * p_my + y1 * p_yy
        y_new = jnp.where(row0, init_y, y_new)

        # accumulate last-row M/X: select row rslen, mask column range
        # (kept as TWO accumulators: result = res_m + res_x must match the
        # scan's f32 summation order bit-exactly)
        c_at = d - rslen  # [1, Bt]
        cmask = ((c_at >= 1) & (c_at <= haplen)).astype(jnp.float32)
        res_m_ref[:] = res_m_ref[:] + cmask * jnp.sum(
            m_new * row_sel, axis=0, keepdims=True
        )
        res_x_ref[:] = res_x_ref[:] + cmask * jnp.sum(
            x_new * row_sel, axis=0, keepdims=True
        )

        m2_ref[:] = m1s
        x2_ref[:] = x1s
        y2_ref[:] = y1s
        m1_ref[:] = m_new
        x1_ref[:] = x_new
        y1_ref[:] = y_new
        return ()

    # four diagonals per iteration amortize the ~1 us fixed per-step cost
    def body4(k, _):
        body(4 * k + 1, ())
        body(4 * k + 2, ())
        body(4 * k + 3, ())
        body(4 * k + 4, ())
        return ()

    n_d = rp + hp - 1
    jax.lax.fori_loop(0, n_d // 4, body4, ())
    for t in range(n_d % 4):
        body(n_d - (n_d % 4) + 1 + t, ())


@functools.partial(jax.jit, static_argnames=("lane_tile",))
def phmm_forward_pallas(batch, lane_tile: int = LANE_TILE):
    """Drop-in replacement for phmm_forward (same outputs)."""
    ph2pr_np, m2m_np, log10_ic, ic = _tables_f32()
    ph2pr = jnp.asarray(ph2pr_np)
    m2m = jnp.asarray(m2m_np)

    rs_row = batch["rs_row"].astype(jnp.int32)
    hap = batch["hap"].astype(jnp.int32)
    rslen = batch["rslen"].astype(jnp.int32)
    haplen = batch["haplen"].astype(jnp.int32)
    b, rp = rs_row.shape
    hp = hap.shape[1]
    assert b % lane_tile == 0, (b, lane_tile)

    p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, distm = _row_probs(batch, ph2pr, m2m)
    one_m_distm = 1.0 - distm
    distm3 = distm / 3.0
    init_y = jnp.float32(ic) / haplen.astype(jnp.float32)

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

    grid = (b // lane_tile,)

    def col_spec(rows):
        return pl.BlockSpec(
            (rows, lane_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    in_specs = (
        [col_spec(rp)] * 9
        + [col_spec(hp + rp)]
        + [col_spec(rp)]
        + [col_spec(1)] * 3
    )
    out_specs = (col_spec(1), col_spec(1))
    res_m, res_x = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((1, b), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rp, lane_tile), jnp.float32),  # m1
            pltpu.VMEM((rp, lane_tile), jnp.float32),  # x1
            pltpu.VMEM((rp, lane_tile), jnp.float32),  # y1
            pltpu.VMEM((rp, lane_tile), jnp.float32),  # m2 (shifted)
            pltpu.VMEM((rp, lane_tile), jnp.float32),  # x2 (shifted)
            pltpu.VMEM((rp, lane_tile), jnp.float32),  # y2 (shifted)
            pltpu.VMEM((rp, lane_tile), jnp.int32),  # hap diag stream
        ],
        cost_estimate=pl.CostEstimate(
            flops=9 * b * rp * hp, bytes_accessed=14 * b * rp * 4, transcendentals=0
        ),
    )(*args)

    result = (res_m + res_x)[0]
    fallback = (result < jnp.float32(MIN_ACCEPTED)) | ~jnp.isfinite(result)
    log10 = jnp.log10(result) - jnp.float32(log10_ic)
    return log10, result, fallback
