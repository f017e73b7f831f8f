"""Chain kernel roofline ablation (PERF.md; like tools/bsw_roofline.py).

Measures a stripped micro-kernel that keeps ONLY the irreducible
per-anchor recurrence of minimap2 chain DP — window slice, dr/dq/dd,
eligibility compares, fixed-point gap, score add, plain max-reduce,
carry write — against the production ring-carry kernel
(ops/chain_pallas.py), which additionally pays for the exact-semantics
bookkeeping observable in outputs: the descending-j visit order (three
log2(w) suffix scans), the max_skip marked-parent bitmask (log2(w)
OR-reduce per 32-bit word), peak-parent tracking, and the parents/peaks
state arrays.  Same batch shape as the PERF.md headline (128 calls x
4096 anchors, w=64).

Usage: python tools/chain_roofline.py [--iters 30] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

NEG = -(1 << 28)
LANE_TILE = 128


def _micro_kernel(params, x_ref, q_ref, qspan_ref, gap0_ref, m_ref,
                  out_sc_ref, sc_ref):
    """Recurrence-only chain step: no suffix scans, no max_skip bitmask,
    no parents/peaks — the dependency chain is sc[i] = max over the
    window of (min_d - gap + sc[j])."""
    w, nc, max_dist_x, max_dist_y, bw = params
    bt = qspan_ref.shape[1]
    j = pl.program_id(1)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (w, bt), 0)
    m_fp = m_ref[0:1, :]
    gap0 = gap0_ref[0:1, :]
    n_log = max(int(np.floor(np.log2(max(bw, 2)))), 1)

    @pl.when(j == 0)
    def _init():
        sc_ref[:] = jnp.zeros((nc + w, bt), jnp.int32)

    def body(t, _):
        qspan_i = qspan_ref[pl.ds(t, 1), :]
        x_i = x_ref[pl.ds(t + w, 1), :]
        q_i = q_ref[pl.ds(t + w, 1), :]
        x_win = x_ref[pl.ds(t, w)]
        q_win = q_ref[pl.ds(t, w)]
        sc_win = sc_ref[pl.ds(t, w)]

        dr = (x_i.astype(jnp.uint32) - x_win.astype(jnp.uint32)).astype(jnp.int32)
        dq = q_i - q_win
        dd = jnp.abs(dr - dq)
        eligible = ((dr != 0) & (dq > 0) & (dq <= max_dist_y)
                    & (dq <= max_dist_x) & (dd <= bw))

        lin = jax.lax.shift_right_logical(dd * m_fp, 20)
        ilog = jnp.zeros((w, bt), jnp.int32)
        for k in range(1, n_log + 1):
            ilog = ilog + (dd >= (1 << k)).astype(jnp.int32)
        gap = gap0 + lin + jax.lax.shift_right_logical(ilog, 1)

        min_d = jnp.minimum(jnp.minimum(dq, dr), qspan_i)
        sc = jnp.where(eligible, min_d - gap + sc_win, NEG)
        m = jnp.max(sc, axis=0)[None, :]
        sc_ref[pl.ds(t + w, 1), :] = jnp.maximum(m, qspan_i)
        return ()

    jax.lax.fori_loop(0, nc, body, ())
    out_sc_ref[:] = sc_ref[pl.ds(w, nc)]
    sc_ref[pl.ds(0, w)] = sc_ref[pl.ds(nc, w)]


@functools.partial(jax.jit, static_argnames=("w", "n_pad", "nc", "bw"))
def micro_batch(x_lo, qi, qspan, m_fp, gap0, w, n_pad, nc, bw):
    b = x_lo.shape[0]
    n_chunks = n_pad // nc

    def halo_chunks(a):
        a_pad = jnp.concatenate(
            [jnp.zeros((b, w), jnp.int32), a.astype(jnp.int32)], axis=1)
        idx = (np.arange(n_chunks)[:, None] * nc
               + np.arange(nc + w)[None, :]).reshape(-1)
        return a_pad[:, idx].T

    grid = (b // LANE_TILE, n_chunks)

    def col(rows):
        return pl.BlockSpec((rows, LANE_TILE), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)

    def chunked(rows):
        return pl.BlockSpec((rows, LANE_TILE), lambda i, j: (j, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_micro_kernel, (w, nc, 5000, 5000, bw)),
        grid=grid,
        in_specs=[chunked(nc + w), chunked(nc + w), chunked(nc),
                  col(1), col(1)],
        out_specs=chunked(nc),
        out_shape=jax.ShapeDtypeStruct((n_pad, b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nc + w, LANE_TILE), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=100 * b * n_pad * w, bytes_accessed=b * n_pad * 8,
            transcendentals=0),
    )(halo_chunks(x_lo), halo_chunks(qi), qspan.astype(jnp.int32).T,
      gap0.astype(jnp.int32)[None, :], m_fp.astype(jnp.int32)[None, :])
    return out.T


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=128)
    ap.add_argument("--n-pad", type=int, default=4096)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--bw", type=int, default=500)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from genomicsbench_palisade_tpu.ops.chain_pallas import (
        chain_dp_pallas_batch)
    from genomicsbench_palisade_tpu.utils.compile_cache import enable

    enable()
    rng = np.random.default_rng(0)
    b, n_pad, w = args.calls, args.n_pad, args.w
    x = np.cumsum(rng.integers(1, 40, (b, n_pad)), axis=1).astype(np.int32)
    qi = np.cumsum(rng.integers(1, 30, (b, n_pad)), axis=1).astype(np.int32)
    qspan = np.full((b, n_pad), 15, np.int32)
    st = np.zeros((b, n_pad), np.int32)
    m_fp = np.full(b, 157286, np.int32)  # 0.15*qspan slope in Q20
    gap0 = np.zeros(b, np.int32)
    n = np.full(b, n_pad, np.int32)
    anchors = b * n_pad

    def time_fn(fn, iters):
        out = fn()
        np.asarray(out if isinstance(out, jnp.ndarray) else out[0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            o = out if isinstance(out, jnp.ndarray) else out[0]
            np.asarray(o)  # chained executions, one host fetch
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # device-resident inputs: re-uploading [128, 4096] i32 args per
    # iteration costs ~0.1 s through the ~70 MB/s relay and would bury
    # both kernels (this is a KERNEL roofline, not a transfer bench)
    dx, dqi, dqs, dst = (jax.device_put(a) for a in (x, qi, qspan, st))
    dm, dg0, dn = (jax.device_put(a) for a in (m_fp, gap0, n))
    t_micro = time_fn(lambda: micro_batch(
        dx, dqi, dqs, dm, dg0, w, n_pad, min(n_pad, 2048), args.bw),
        args.iters)
    t_prod = time_fn(lambda: chain_dp_pallas_batch(
        dx, dqi, dqs, dst, dm, dg0, dn, w, n_pad, 5000, 5000, args.bw),
        args.iters)

    print(json.dumps({
        "shape": f"{b}x{n_pad} w={w}",
        "micro_s": round(t_micro, 6),
        "prod_s": round(t_prod, 6),
        "micro_manchors_per_s": round(anchors / t_micro / 1e6, 1),
        "prod_manchors_per_s": round(anchors / t_prod / 1e6, 1),
        "prod_over_bound": round(t_prod / t_micro, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
