"""Synthesize a FASTQ of reads sampled from a FASTA reference.

Companion to tools/genome_scale_fmi.py for driver-level rehearsals: the
reference's fmi benchmark consumes 1M x 151 bp FASTQ reads against the
hg38+alt index (SURVEY.md §6, fmi_output:23-27); this emits the same
shape of input from a synthetic reference so `cli.fmi` can be driven at
that scale end-to-end (FASTQ parse -> encode -> search -> metric lines).

Reads are uniform-random positions on the forward strand with a 1%
substitution rate (same convention as genome_scale_fmi.synth_reads);
quality is a constant 'I' line (qualities do not affect SMEM search,
fmi.cpp encodes bases only).

Usage:
  python tools/synth_fastq.py ref.fa out.fq --reads 1000000 --read-len 151
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_fa")
    ap.add_argument("out_fq")
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--read-len", type=int, default=151)
    ap.add_argument("--sub-rate", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args(argv)

    from genomicsbench_palisade_tpu.index.builder import pack_fasta

    t0 = time.perf_counter()
    codes, _names, _lengths = pack_fasta(args.ref_fa)
    rng = np.random.default_rng(args.seed)
    L = args.read_len
    starts = rng.integers(0, len(codes) - L, args.reads)
    # gather all reads in one fancy-index (rows = starts[:,None] + arange)
    enc = codes[starts[:, None] + np.arange(L)].astype(np.uint8)
    sub = rng.random(enc.shape) < args.sub_rate
    enc[sub] = rng.integers(0, 4, int(sub.sum()), dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)[enc]  # [n, L] ASCII

    qual = b"I" * L
    with open(args.out_fq, "wb") as f:
        buf = []
        for i in range(args.reads):
            buf.append(b"@r%d\n%s\n+\n%s\n"
                       % (i, bases[i].tobytes(), qual))
            if len(buf) == 65536:
                f.write(b"".join(buf))
                buf.clear()
        f.write(b"".join(buf))
    print(f"[synth_fastq] {args.reads} x {L} bp -> {args.out_fq} "
          f"in {time.perf_counter() - t0:.0f} s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
