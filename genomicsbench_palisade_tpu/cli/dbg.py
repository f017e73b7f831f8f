"""dbg driver: `python -m genomicsbench_palisade_tpu.cli.dbg <bam> <region> <ref.fa> <threads>`.

Mirrors benchmarks/dbg/debruijn.cpp:1438-1630: reads the region's
alignments, slides 1500bp assembly windows (shift 750), builds the
colored de Bruijn graph per window (k=15, minQual=20).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import os

from ..io.bam import SEQ_NT16_STR, read_bam, read_bam_region
from ..io.fastq import read_all
from ..ops.dbg import assemble_window, window_batches


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dbg")
    ap.add_argument("bam")
    ap.add_argument("region")
    ap.add_argument("ref_fasta")
    ap.add_argument("threads", type=int, nargs="?", default=1, help="ignored")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    chrom, _, rng = args.region.partition(":")
    if rng:
        beg, end = (int(v) for v in rng.split("-"))
        beg -= 1
    else:
        beg, end = 0, None

    ref = {name: seq for name, seq, _q in read_all(args.ref_fasta)}[chrom].upper()
    if end is None:
        end = len(ref)

    if beg is not None and end is not None and os.path.exists(args.bam + ".bai"):
        refs, records = read_bam_region(args.bam, chrom, beg, end)
    else:
        refs, records = read_bam(args.bam)
    names = [n for n, _l in refs]
    rid = names.index(chrom)
    reads = []
    lut = np.frombuffer(SEQ_NT16_STR.encode(), dtype=np.uint8)
    for rec in records:
        if rec.ref_id != rid:
            continue
        seq = lut[rec.seq_nt16].tobytes().decode()
        span = sum(ln for op, ln in rec.cigar if op in "MDN=X")
        reads.append((rec.pos, rec.pos + span, seq, rec.qual, rec.flag))

    from ..io.native import dbg_window_native

    # per-window read selection: reads are coordinate-sorted (BAM), so a
    # window's overlap set lives in pos range [assem_start - max_span,
    # assem_end) — searchsorted keeps the region loop O(reads-per-window)
    # instead of rescanning every region read per 1.5 kb window (the
    # reference's debruijn.cpp:1492-1516 gets this from its per-window
    # htslib iterators)
    pos_arr = np.array([r[0] for r in reads], np.int64)
    rend_arr = np.array([r[1] for r in reads], np.int64)
    sorted_ok = bool(np.all(pos_arr[1:] >= pos_arr[:-1]))
    max_span = int((rend_arr - pos_arr).max()) if len(reads) else 0

    def select(assem_start, assem_end):
        if not sorted_ok:  # unsorted BAM fallback: full scan
            return [(s, q, f) for p, re_, s, q, f in reads
                    if p < assem_end and re_ > assem_start]
        lo = int(np.searchsorted(pos_arr, assem_start - max_span))
        hi = int(np.searchsorted(pos_arr, assem_end))
        return [(reads[i][2], reads[i][3], reads[i][4])
                for i in range(lo, hi) if rend_arr[i] > assem_start]

    t0 = time.perf_counter()
    n_windows = 0
    total_nodes = 0
    total_bubbles = 0
    for assem_start, assem_end, ref_start, ref_end in window_batches(beg, end):
        window_reads = select(assem_start, assem_end)
        # native C++ window assembly when built (native/dbg.cpp, ~21x;
        # fuzz-exact vs ops.dbg.assemble_window)
        nat = dbg_window_native(ref[ref_start:ref_end], ref_start,
                                window_reads, 15, 20, 2)
        if nat is not None:
            n_nodes, bubbles = nat
        else:
            g, bubbles = assemble_window(
                ref[ref_start:ref_end], ref_start, window_reads)
            n_nodes = len(g.nodes)
        n_windows += 1
        total_nodes += n_nodes
        total_bubbles += len(bubbles)
    dt = time.perf_counter() - t0
    print(f"Found {n_windows} batches.")
    print(f"total graph nodes: {total_nodes}, read bubbles: {total_bubbles}")
    print(f"Time in kernel: {dt:.2f} sec", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
