"""Production f5c eventalign-mode postprocessing (host path).

The semantics ground truth is ops/oracle/eventalign.py (byte-exact vs the
reference-built goldens in tests/fixtures/eventalign_golden.json); this
module runs the same chain with the hot profile-HMM realign dispatched to
the native engine (native/eventalign.cpp) when built, reconstructing the
kmer strings from positions — for non-rc reads model_kmer == ref_kmer, for
rc reads model_kmer == revcomp(ref_kmer), and B states emit N^k
(eventalign.c:1468-1501).
"""

from __future__ import annotations

import numpy as np

from ..io.native import eventalign_realign_native
from .oracle import eventalign as EA
from .oracle.abea import KMER_SIZE

_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def realign_read(record, ref_segment, ref_offset, read_length, events, sc,
                 model, b2e, events_per_base, read_idx,
                 region_start=-1, region_end=-1, use_native=None):
    """align_read_to_ref with native dispatch; returns the oracle's
    event_alignment dict list."""
    ref_seq = EA.disambiguate(ref_segment)
    segments = EA.get_aligned_segments(record, 1)
    max_kmer_idx = read_length - KMER_SIZE
    trimmed = []
    for seg in segments:
        if region_start != -1 and region_end != -1:
            seg = EA.trim_aligned_pairs_to_ref_region(
                seg, region_start, region_end)
        trimmed.append(EA.trim_aligned_pairs_to_kmer(seg, max_kmer_idx))
    if use_native is not False:
        ref_codes = np.frombuffer(
            ref_seq.encode().translate(bytes.maketrans(b"ACGT", bytes([0, 1, 2, 3]))),
            np.uint8)
        res = eventalign_realign_native(
            ref_codes, ref_offset, trimmed, record.is_reverse, read_length,
            events["mean"], sc, model, b2e, events_per_base)
        if res is not None:
            rp, ei, st = res
            rc = record.is_reverse
            out = []
            for ref_position, event_idx, state in zip(
                    rp.tolist(), ei.tolist(), st.decode()):
                ref_kmer = ref_seq[ref_position - ref_offset:
                                   ref_position - ref_offset + KMER_SIZE]
                if state == "B":
                    model_kmer = "N" * KMER_SIZE
                elif rc:
                    model_kmer = EA.reverse_complement(ref_kmer)
                else:
                    model_kmer = ref_kmer
                out.append({"ref_position": ref_position,
                            "ref_kmer": ref_kmer, "read_idx": read_idx,
                            "event_idx": event_idx, "rc": rc,
                            "model_kmer": model_kmer, "hmm_state": state})
            return out
        if use_native:
            raise RuntimeError("native eventalign engine not built")
    return EA.align_read_to_ref(
        record, ref_segment, ref_offset, read_length, events, sc, model,
        b2e, events_per_base, read_idx, region_start, region_end)
