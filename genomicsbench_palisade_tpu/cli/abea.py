"""abea driver: `python -m genomicsbench_palisade_tpu.cli.abea
--reads <fasta> --raw <signals.npz|.fast5> --model <pore_model.tsv>`.

Reproduces the f5c eventalign pipeline the reference benchmarks
(benchmarks/abea/src/main.c:70 meth_main -> f5c.c event_db/align_db ->
align.c / align.cu): per read, detect events from the raw signal
(events.c getevents), estimate shift/scale by method of moments
(align.c:49-95), run the adaptive banded event alignment (the TPU
kernel in ops.abea), and emit the eventalign TSV
(f5cmisc.h emit_event_alignment_tsv columns) plus the stderr kernel
timer.  The reference reads signals from fast5 via BAM lookup; this
driver takes signals keyed by read name directly (npz always, fast5
when h5py is present).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..io.fastq import read_sequences
from ..io.signal import load_pore_model, load_signals_fast5, load_signals_npz
from ..ops import abea as A
from ..ops.oracle import events as E
from ..ops.oracle.abea import KMER_SIZE


def emit_read(name, seq, events, shift, scale, pairs, model, out):
    from ..ops.oracle.abea import get_kmer_rank

    for kmer_idx, event_idx in pairs:
        kmer = seq[kmer_idx:kmer_idx + KMER_SIZE]
        rank = get_kmer_rank(kmer)
        ev = events[event_idx]
        std_level = (ev["mean"] - shift - scale * model["level_mean"][rank]) / (
            scale * model["level_stdv"][rank]
        )
        out.write(
            f"{name}\t{kmer_idx}\t{kmer}\t{event_idx}\t"
            f"{ev['mean']:.2f}\t{ev['stdv']:.3f}\t{ev['length']:.0f}\t"
            f"{kmer}\t{model['level_mean'][rank]:.2f}\t"
            f"{model['level_stdv'][rank]:.2f}\t{std_level:.2f}\n"
        )
    return len(pairs)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="abea")
    ap.add_argument("--reads", required=True, help="FASTA/FASTQ of read sequences")
    ap.add_argument("--raw", required=True,
                    help=".npz (name->signal pA) or .fast5 raw signals")
    ap.add_argument("--model", required=True, help="pore model TSV (nanopolish format)")
    ap.add_argument("-o", "--output", default="-")
    ap.add_argument("-t", "--threads", type=int, default=1, help="ignored (device-parallel)")
    args = ap.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()

    model = load_pore_model(args.model)
    if args.raw.endswith(".fast5"):
        signals = load_signals_fast5(args.raw)
    else:
        signals = load_signals_npz(args.raw)

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    out.write("contig\tposition\treference_kmer\tevent_index\t"
              "event_level_mean\tevent_stdv\tevent_length\tmodel_kmer\t"
              "model_mean\tmodel_stdv\tstandardized_level\n")

    n_aligned = n_reads = 0
    t0 = time.perf_counter()
    # host: event detection + MoM scaling per read; device: ONE vmapped
    # band fill per shape bucket (ops.abea.align_events_batch)
    names, seqs, evs, shifts, scales = [], [], [], [], []
    for name, seq, _q in read_sequences(args.reads):
        if name not in signals:
            print(f"WARNING: no raw signal for read {name}, skipped", file=sys.stderr)
            continue
        n_reads += 1
        events = E.getevents(signals[name])
        if len(events) < 2 or len(seq) < KMER_SIZE + 1:
            continue
        shift, scale = E.estimate_scalings_using_mom(seq, model, events)
        names.append(name)
        seqs.append(seq)
        evs.append(events)
        shifts.append(float(shift))
        scales.append(float(scale))
    all_pairs = A.align_events_batch(
        seqs, [e["mean"] for e in evs], model, scales, shifts)
    for name, seq, events, shift, scale, pairs in zip(
            names, seqs, evs, shifts, scales, all_pairs):
        n_aligned += emit_read(name, seq, events, shift, scale, pairs, model, out)
    runtime = time.perf_counter() - t0

    if out is not sys.stdout:
        out.close()
    print(f"[eventalign] {n_reads} reads, {n_aligned} aligned event-kmer pairs",
          file=sys.stderr)
    print(f"Kernel time: {runtime:.3f} sec", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
