"""bsw roofline ablation (VERDICT r2 stretch item 9).

Times the production banded-SW kernel against a STRIPPED micro-kernel
that keeps only the irreducible per-row recurrence — score add, E/F
updates with the lazy-F sublane cummax chain, H write — and drops
everything else (band tracking, zdrop, running maxima, h1 bookkeeping).
If production ~= stripped, the kernel runs AT its dependency-chain
bound and further gains need fewer ops per cell, not better scheduling
(the phmm_pallas 94-cyc/step argument, PERF.md).

Usage: python tools/bsw_roofline.py [--pairs 8192] [--reps 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NEG = -(1 << 20)
LANE_TILE = 128


def _stripped_kernel(params, q_codes_ref, target_ref, out_ref, h_ref, e_ref):
    o_del, e_del, o_ins, e_ins, match, mismatch = params
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    qe_pad, bt = q_codes_ref.shape
    tp = target_ref.shape[0]

    q_codes = q_codes_ref[:]
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (qe_pad, bt), 0)
    neg = jnp.full((qe_pad, bt), NEG, jnp.int32)
    log_rounds = max(int(np.ceil(np.log2(qe_pad))), 1)

    def cummax_sub(g):
        for k in range(log_rounds):
            sh = 1 << k
            rolled = pltpu.roll(g, sh, axis=0)
            g = jnp.where(j_iota >= sh, jnp.maximum(g, rolled), g)
        return g

    def body(i, _):
        h = h_ref[:]
        e = e_ref[:]
        t_char = target_ref[pl.ds(jnp.minimum(i, tp - 1), 1), :]
        qsc = jnp.where(q_codes == t_char, jnp.int32(match),
                        jnp.int32(-mismatch))
        m_val = jnp.where(h != 0, h + qsc, 0)
        h0_val = jnp.maximum(m_val, e)
        c = jnp.maximum(m_val - oe_ins, 0)
        g = jnp.maximum(c + j_iota * e_ins, neg)
        gmax = cummax_sub(g)
        gsh = jnp.where(j_iota == 0, NEG, pltpu.roll(gmax, 1, axis=0))
        f = jnp.maximum(gsh - (j_iota - 1) * e_ins, 0)
        h_row = jnp.maximum(h0_val, f)
        e_next = jnp.maximum(e - e_del, jnp.maximum(m_val - oe_del, 0))
        h_ref[:] = jnp.where(j_iota == 0, 0, pltpu.roll(h_row, 1, axis=0))
        e_ref[:] = e_next
        return ()

    jax.lax.fori_loop(0, tp, body, ())
    out_ref[:] = h_ref[pl.ds(0, 8)]


@functools.partial(jax.jit, static_argnames=("params",))
def _stripped(q_codes, target, params):
    qe_pad, b = q_codes.shape
    tp = target.shape[0]
    grid = (b // LANE_TILE,)

    def col_spec(rows):
        return pl.BlockSpec((rows, LANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_stripped_kernel, params),
        grid=grid,
        in_specs=[col_spec(qe_pad), col_spec(tp)],
        out_specs=col_spec(8),
        out_shape=jax.ShapeDtypeStruct((8, b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((qe_pad, LANE_TILE), jnp.int32)] * 2,
    )(q_codes, target)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8192)
    ap.add_argument("--qlen", type=int, default=128)
    ap.add_argument("--tlen", type=int, default=256)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--chain", type=int, default=8,
                    help="executions chained per timing (relay does not "
                         "block on block_until_ready)")
    args = ap.parse_args(argv)

    from genomicsbench_palisade_tpu.ops import bsw as W
    from genomicsbench_palisade_tpu.ops.bsw_pallas import bsw_batch_pallas
    from genomicsbench_palisade_tpu.utils.compile_cache import enable
    enable()

    rng = np.random.default_rng(5)
    b, ql, tl = args.pairs, args.qlen, args.tlen
    tgt = rng.integers(0, 4, (b, tl), np.int32)
    qry = tgt[:, :ql].copy()
    mut = rng.random((b, ql)) < 0.08
    qry[mut] = rng.integers(0, 4, int(mut.sum()))
    pairs = [(qry[i], tgt[i], 30) for i in range(b)]
    batch = {k: jax.device_put(v) for k, v in
             W.prepare_pairs(pairs, q_pad=ql, t_pad=tl).items()}

    qe_pad = -(-(ql + 1) // 8) * 8
    q_dev = jax.device_put(
        np.pad(qry.T, ((0, qe_pad - ql), (0, 0)), constant_values=5)
        .astype(np.int32))
    t_dev = jax.device_put(tgt.T.astype(np.int32))
    sparams = (6, 1, 6, 1, 1, 4)

    cells = float(b) * ql * tl

    def timed(fn):
        fn()  # compile + warm
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                out = fn()
            np.asarray(out)[:1] if hasattr(out, "shape") else None
            dt = (time.perf_counter() - t0) / args.chain
            best = dt if best is None else min(best, dt)
        return best

    t_prod = timed(lambda: bsw_batch_pallas(batch)["score"])
    t_strip = timed(lambda: _stripped(q_dev, t_dev, sparams))

    out = {
        "tool": "bsw_roofline", "pairs": b, "qlen": ql, "tlen": tl,
        "prod_ms": round(t_prod * 1e3, 2),
        "strip_ms": round(t_strip * 1e3, 2),
        "prod_gcups": round(cells / t_prod / 1e9, 1),
        "strip_gcups": round(cells / t_strip / 1e9, 1),
        "overhead_vs_recurrence": round(t_prod / t_strip, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
