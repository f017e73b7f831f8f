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


def score_pairs(pairs, params: BswParams = DEFAULT_PARAMS,
                edges=(32, 64, 128, 256, 512), dev_batch: int = DEV_BATCH):
    """Bucketed scoring; returns list of result dicts in input order."""
    results = [None] * len(pairs)
    groups = group_by_buckets(pairs, lambda p: (len(p[0]), len(p[1])), edges)
    ptuple = B._params_tuple(params)
    from ..ops.bsw_pallas import bsw_batch_pallas

    for (q_pad, t_pad), members in groups.items():
        idxs = [i for i, _ in members]
        sub = [p for _, p in members]
        n = len(sub)
        # the pallas kernel (VMEM-resident, ~8x the scan) needs 128-lane
        # tiles; large buckets run as fixed-size chunks (every chunk
        # padded to the same shape -> one compile per bucket)
        chunk = min(dev_batch, -(-n // 128) * 128)
        filler = (np.zeros(1, int), np.zeros(1, int), 0)
        for lo in range(0, n, chunk):
            part = sub[lo : lo + chunk]
            part = part + [filler] * (chunk - len(part))
            batch = B.prepare_pairs(part, params, q_pad=q_pad, t_pad=t_pad)
            out = {k: np.asarray(v)
                   for k, v in bsw_batch_pallas(batch, ptuple).items()}
            for row, i in enumerate(idxs[lo : lo + chunk]):
                results[i] = {k: int(out[k][row]) for k in out}
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
        for r in results:
            print(
                f"{r['score']} {r['qle']} {r['tle']} {r['gtle']} "
                f"{r['gscore']} {r['max_off']}"
            )
    print(f"Overall SW cycles(kernel time) = {kernel_time:.4f} sec")
    print(f"Total Pairs processed: {len(results)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
