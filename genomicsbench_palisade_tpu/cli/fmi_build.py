"""fmi index builder: `python -m genomicsbench_palisade_tpu.cli.fmi_build
<ref.fasta> [-p prefix] [--bwt2bit]`.

Mirrors `bwa-mem2 index` (tools/bwa-mem2/src/FMI_search.cpp:358
build_index called from the bwa-mem2 index main): packs the FASTA
(non-ACGT -> seeded random base), builds the fwd+revcomp suffix array
with native SA-IS, writes the device npz index and optionally the
reference's exact `.bwt.2bit.64` binary, and prints the same stats
load_index reports (ref_seq_len, count[], sentinel index).
"""

from __future__ import annotations

import argparse
import sys
import time

from ..index.builder import build_from_fasta


def main(argv=None):
    ap = argparse.ArgumentParser(prog="fmi_build")
    ap.add_argument("fasta")
    ap.add_argument("-p", "--prefix", default=None,
                    help="output prefix (default: the fasta path)")
    ap.add_argument("--bwt2bit", action="store_true",
                    help="also write the bwa-mem2 .bwt.2bit.64 binary")
    ap.add_argument("--bntseq", action="store_true",
                    help="also write the bwa .ann/.amb/.pac metadata")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    prefix = args.prefix or args.fasta
    t0 = time.perf_counter()
    idx, names, lengths = build_from_fasta(args.fasta, prefix, args.bwt2bit,
                                           bntseq=args.bntseq)
    dt = time.perf_counter() - t0

    print(f"* Index prefix: {prefix}")
    print(f"* Contigs: {len(names)}, total length {int(lengths.sum())}")
    print(f"* ref_seq_len: {idx.ref_seq_len}")
    for i, c in enumerate(idx.count):
        print(f"* count[{i}] = {int(c)}")
    print(f"* sentinel_index: {idx.sentinel_index}")
    print(f"* Build time: {dt:.2f} sec", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
