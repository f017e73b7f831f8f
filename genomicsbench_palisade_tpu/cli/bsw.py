"""bsw driver: `python -m genomicsbench_palisade_tpu.cli.bsw -pairs <file>`.

Mirrors the reference driver (benchmarks/bsw/main_banded.cpp:673-960):
reads 3-line pair records, scores every pair with the banded SW extension
kernel, and prints the per-pair results plus total pairs and kernel time.
Work is bucketed by padded (tlen, qlen) shape and batch-parallel on device.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..io.bucketing import group_by_buckets
from ..io.pairs import parse_pairs
from ..ops import bsw as B
from ..ops.oracle.bsw import DEFAULT_PARAMS, BswParams


DEV_BATCH = 65536  # pairs per device dispatch: bounds the transposed
#  [t_pad, B] i32 staging the kernel wrapper builds in HBM (~64 MB/array
#  at t_pad=256) — dispatching a whole dataset-scale bucket at once
#  (10.6M pairs, scripts/bsw_large:8) needs >18 GB and OOMs the chip


OUT_FIELDS = ("score", "qle", "tle", "gtle", "gscore", "max_off")


def score_pairs(pairs, params: BswParams = DEFAULT_PARAMS,
                edges=(32, 64, 128, 256, 512), dev_batch: int = DEV_BATCH):
    """Bucketed scoring; returns a dict of [n_pairs] int32 arrays (the 6
    output fields, OUT_FIELDS) in input order.

    Dataset-scale layout (the reference's bsw_large is 10.6M pairs,
    scripts/bsw_large:5-8): struct-of-arrays end to end — per-pair
    Python dicts cost more than the kernel at this scale — with
    vectorized mask-scatter padding, all chunks DISPATCHED before any
    output fetch (transfers/kernels pipeline through the relay's async
    stream), and one fetched array per chunk."""
    import jax.numpy as jnp

    from ..ops.bsw_pallas import (bsw_batch_pallas, bsw_batch_pallas_packed,
                                  pack_codes_2bit)

    n_all = len(pairs)
    results = {k: np.zeros(n_all, np.int32) for k in OUT_FIELDS}
    groups = group_by_buckets(pairs, lambda p: (len(p[0]), len(p[1])), edges)
    ptuple = B._params_tuple(params)

    pending = []  # (idx array, device [6, chunk] stack)
    for (q_pad, t_pad), members in groups.items():
        idxs = np.fromiter((i for i, _ in members), np.int64, len(members))
        sub = [p for _, p in members]
        n = len(sub)
        ql = np.fromiter((len(q) for q, _, _ in sub), np.int32, n)
        tl = np.fromiter((len(t) for _, t, _ in sub), np.int32, n)
        h0 = np.fromiter((h for _, _, h in sub), np.int32, n)
        # the pallas kernel (VMEM-resident, ~8x the scan) needs 128-lane
        # tiles; large buckets run as fixed-size chunks (every chunk
        # padded to the same shape -> one compile per bucket)
        chunk = min(dev_batch, -(-n // 128) * 128)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            m = hi - lo
            # mask-scatter: one flat concat + one boolean assignment per
            # side instead of 2 row copies per pair
            qm = np.arange(q_pad)[None, :] < ql[lo:hi, None]
            tm = np.arange(t_pad)[None, :] < tl[lo:hi, None]
            flat_q = np.concatenate([q for q, _, _ in sub[lo:hi]])
            flat_t = np.concatenate([t for _, t, _ in sub[lo:hi]])
            # 2-bit wire format when every code is a plain base (0..3):
            # the relay moves ~70 MB/s, so raw sequence bytes dominate
            # dataset-scale wall (BSW_SCALE.json); pack 4 bases/byte on
            # host, unpack on device inside the kernel's jit.  Codes >= 4
            # (ambiguous bases) fall back to the raw int8 path.
            packable = (q_pad % 4 == 0 and t_pad % 4 == 0
                        and (flat_q.size == 0 or
                             (flat_q.min() >= 0 and flat_q.max() <= 3))
                        and (flat_t.size == 0 or
                             (flat_t.min() >= 0 and flat_t.max() <= 3)))
            lens = {"qlen": np.pad(ql[lo:hi], (0, chunk - m)),
                    "tlen": np.pad(tl[lo:hi], (0, chunk - m)),
                    "h0": np.pad(h0[lo:hi], (0, chunk - m))}
            if packable:
                query = np.zeros((chunk, q_pad), np.uint8)
                target = np.zeros((chunk, t_pad), np.uint8)
                query[:m][qm] = flat_q
                target[:m][tm] = flat_t
                batch = {"qpack": pack_codes_2bit(query),
                         "tpack": pack_codes_2bit(target), **lens}
                out = bsw_batch_pallas_packed(batch, q_pad, t_pad, ptuple)
            else:
                query = np.full((chunk, q_pad), 4, np.int8)
                target = np.full((chunk, t_pad), 4, np.int8)
                query[:m][qm] = flat_q
                target[:m][tm] = flat_t
                batch = {"query": query, "target": target, **lens}
                out = bsw_batch_pallas(batch, ptuple)
            pending.append((idxs[lo:hi],
                            jnp.stack([out[k][:m] for k in OUT_FIELDS])))
    for idx, dev in pending:
        fetched = np.asarray(dev)
        for row, k in enumerate(OUT_FIELDS):
            results[k][idx] = fetched[row]
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bsw")
    ap.add_argument("-pairs", "--pairs", required=True, dest="pairs")
    ap.add_argument("-t", "--threads", type=int, default=1, help="ignored (device-parallel)")
    ap.add_argument("-b", "--batch", type=int, default=512, help="accepted for CLI parity")
    ap.add_argument("-m", "--match", type=int, default=1)
    ap.add_argument("-x", "--mismatch", type=int, default=4)
    ap.add_argument("-o", "--open", type=int, default=6, dest="gapo")
    ap.add_argument("-e", "--extend", type=int, default=1, dest="gape")
    ap.add_argument("--print-output", action="store_true")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    params = BswParams(
        o_del=args.gapo,
        e_del=args.gape,
        o_ins=args.gapo,
        e_ins=args.gape,
        match=args.match,
        mismatch=args.mismatch,
    )
    t0 = time.perf_counter()
    pairs = parse_pairs(args.pairs)
    read_time = time.perf_counter() - t0
    print(f"Read time = {read_time:.4f}")
    print(f"Total Pairs read: {len(pairs)}")

    t0 = time.perf_counter()
    results = score_pairs(pairs, params)
    kernel_time = time.perf_counter() - t0
    if args.print_output:
        cols = np.stack([results[k] for k in OUT_FIELDS], axis=1)
        sys.stdout.write("\n".join(
            " ".join(map(str, row)) for row in cols.tolist()) + "\n")
    print(f"Overall SW cycles(kernel time) = {kernel_time:.4f} sec")
    print(f"Total Pairs processed: {len(pairs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
