"""medaka-style pileup feature counting (benchmarks/pileup capability).

Semantics source: benchmarks/pileup/medaka_counts.c:299-497
(calculate_pileup), medaka_counts.h:65-78 (feature order "acgtACGTdD",
num2countbase via 16-bit IUPAC + 16*is_reverse), medaka_bamiter.c:7-45
(primary-only, mapq >= 1 filter), main at :498-560 (num_homop=5, per-
100kb chunks).

TPU-native reformulation: htslib's per-column pileup iterator becomes a
two-pass event pipeline —
  pass 1: expand every read's CIGAR into (ref_pos, minor_j, feature)
          events + per-position max-insert lengths (vectorized numpy walk)
  pass 2: prefix-sum the per-position column widths into a global column
          index and scatter-add all events into the counts matrix
          (jnp .at[].add on device).

Parity quirks preserved: insertions anchored at a deleted base expand the
column space (max_ins counts them) but contribute no counts (the is_del
branch ignores indel); ambiguity codes (num2countbase == -1) are skipped;
deletions always land in qstrat layer 0.
"""

from __future__ import annotations

import numpy as np

from ..io.bam import FDUP, FQCFAIL, FSECONDARY, FSUPPLEMENTARY, FUNMAP

PLP_BASES = "acgtACGTdD"
FEATLEN = 10
FWD_DEL = 9
REV_DEL = 8

# 16-bit IUPAC (+16 for reverse strand) -> feature index (medaka_counts.h:74)
NUM2COUNTBASE = np.array(
    [-1, 4, 5, -1, 6, -1, -1, -1, 7, -1, -1, -1, -1, -1, -1, -1,
     -1, 0, 1, -1, 2, -1, -1, -1, 3, -1, -1, -1, -1, -1, -1, -1],
    dtype=np.int32,
)

FILTER_FLAGS = FUNMAP | FSECONDARY | FSUPPLEMENTARY | FQCFAIL | FDUP


def weibull_fractions(scale: float, shape: float, num_homop: int) -> np.ndarray:
    """_get_weibull_scores math (medaka_counts.c:262-268): per homopolymer
    stratum x in 1..num_homop, -exp(-a)*expm1(a-b) with a=((x-1)/scale)^shape,
    b=(x/scale)^shape, clamped at 0."""
    x = np.arange(1, num_homop + 1, dtype=np.float64)
    a = np.power((x - 1) / scale, shape)
    b = np.power(x / scale, shape)
    return np.maximum(0.0, -np.exp(-a) * np.expm1(a - b)).astype(np.float64)


def _weibull_weights(rec, qpos: int, num_homop: int, bad_reads: set):
    """Per-stratum fractional counts for one read base (WL/WK aux arrays);
    zeros when the tags are missing or out of range (medaka_counts.c:232-259).
    """
    wl = rec.tags.get("WL")
    wk = rec.tags.get("WK")
    if wl is None or wk is None:
        if rec.name not in bad_reads:
            bad_reads.add(rec.name)
        return np.zeros(num_homop)
    if qpos >= len(wl) or qpos >= len(wk):
        return np.zeros(num_homop)
    return weibull_fractions(float(wl[qpos]), float(wk[qpos]), num_homop)


def read_events(rec, num_homop: int, weibull: bool = False,
                bad_reads: set | None = None):
    """Expand one BAM record into pileup events.

    The non-weibull path is vectorized per cigar op (_read_events_fast;
    the per-base Python loop below is the weibull path and the spec —
    tests assert fast == slow).

    Returns (positions, minors, features, qstrats, ins_pos, ins_len[,
    weights]): counting events + insertion-anchor info for the max_ins
    pass.  With weibull=True, non-deletion events carry [num_homop]
    fractional weights (x10000 at accumulation, medaka_counts.c:453-459)
    instead of a qstrat, and weights is the extra return.
    """
    if not weibull:
        return _read_events_fast(rec, num_homop)
    positions, minors, feats, qstrats = [], [], [], []
    weights = []
    ins_pos, ins_len = [], []
    rp = rec.pos
    qp = 0
    rev = rec.is_reverse
    seq = rec.seq_nt16
    qual = rec.qual
    cigar = rec.cigar
    nops = len(cigar)
    for oi, (op, ln) in enumerate(cigar):
        if op in ("M", "=", "X"):
            for t in range(ln):
                base = int(seq[qp + t]) + (16 if rev else 0)
                bi = int(NUM2COUNTBASE[base])
                q = int(qual[qp + t])
                qstrat = min(q, num_homop)
                qstrat = max(0, qstrat - 1) if num_homop > 1 else 0
                if bi != -1:
                    positions.append(rp + t)
                    minors.append(0)
                    feats.append(bi)
                    qstrats.append(qstrat)
                    if weibull:
                        weights.append(_weibull_weights(rec, qp + t,
                                                        num_homop, bad_reads))
            # insertion following the last aligned base of this op
            if oi + 1 < nops and cigar[oi + 1][0] == "I":
                ili = cigar[oi + 1][1]
                anchor_r = rp + ln - 1
                anchor_q = qp + ln - 1
                ins_pos.append(anchor_r)
                ins_len.append(ili)
                for j in range(1, ili + 1):
                    base = int(seq[anchor_q + j]) + (16 if rev else 0)
                    bi = int(NUM2COUNTBASE[base])
                    q = int(qual[anchor_q + j])
                    qstrat = min(q, num_homop)
                    qstrat = max(0, qstrat - 1) if num_homop > 1 else 0
                    if bi != -1:
                        positions.append(anchor_r)
                        minors.append(j)
                        feats.append(bi)
                        qstrats.append(qstrat)
                        if weibull:
                            weights.append(_weibull_weights(
                                rec, anchor_q + j, num_homop, bad_reads))
            rp += ln
            qp += ln
        elif op == "D":
            for t in range(ln):
                positions.append(rp + t)
                minors.append(0)
                feats.append(REV_DEL if rev else FWD_DEL)
                qstrats.append(0)
                if weibull:  # deletions stay integer +1 at stratum 0
                    w = np.zeros(num_homop)
                    w[0] = 1.0 / 10000.0  # x10000 scaling restores +1
                    weights.append(w)
            # insertion anchored at a deleted base: expands columns only
            if oi + 1 < nops and cigar[oi + 1][0] == "I":
                ins_pos.append(rp + ln - 1)
                ins_len.append(cigar[oi + 1][1])
            rp += ln
        elif op == "I":
            qp += ln  # consumed by the anchor logic above
        elif op == "S":
            qp += ln
        elif op == "N":
            rp += ln
        # H, P consume nothing
    if weibull:
        return positions, minors, feats, qstrats, ins_pos, ins_len, weights
    return positions, minors, feats, qstrats, ins_pos, ins_len


def _read_events_fast(rec, num_homop: int):
    """Vectorized read_events (no weibull): same events in the same
    order, arrays instead of Python lists."""
    positions, minors, feats, qstrats = [], [], [], []
    ins_pos, ins_len = [], []
    rp = rec.pos
    qp = 0
    rev = rec.is_reverse
    rev_off = 16 if rev else 0
    del_feat = REV_DEL if rev else FWD_DEL
    seq = np.asarray(rec.seq_nt16, np.int64)
    qual = np.asarray(rec.qual, np.int64)
    cigar = rec.cigar
    nops = len(cigar)

    def emit(q_idx, r_pos, minor_val):
        bi = NUM2COUNTBASE[seq[q_idx] + rev_off].astype(np.int64)
        q = qual[q_idx]
        if num_homop > 1:
            qs = np.maximum(np.minimum(q, num_homop) - 1, 0)
        else:
            qs = np.zeros(len(q_idx), np.int64)
        keep = bi != -1
        positions.append(r_pos[keep])
        minors.append(minor_val[keep])
        feats.append(bi[keep])
        qstrats.append(qs[keep])

    for oi, (op, ln) in enumerate(cigar):
        if op in ("M", "=", "X"):
            idx = np.arange(ln)
            emit(qp + idx, rp + idx, np.zeros(ln, np.int64))
            if oi + 1 < nops and cigar[oi + 1][0] == "I":
                ili = cigar[oi + 1][1]
                anchor_r = rp + ln - 1
                anchor_q = qp + ln - 1
                ins_pos.append(anchor_r)
                ins_len.append(ili)
                j = np.arange(1, ili + 1)
                emit(anchor_q + j, np.full(ili, anchor_r, np.int64), j)
            rp += ln
            qp += ln
        elif op == "D":
            positions.append(rp + np.arange(ln))
            minors.append(np.zeros(ln, np.int64))
            feats.append(np.full(ln, del_feat, np.int64))
            qstrats.append(np.zeros(ln, np.int64))
            if oi + 1 < nops and cigar[oi + 1][0] == "I":
                ins_pos.append(rp + ln - 1)
                ins_len.append(cigar[oi + 1][1])
            rp += ln
        elif op in ("I", "S"):
            qp += ln
        elif op == "N":
            rp += ln
        # H, P consume nothing

    def cat(parts):
        return np.concatenate(parts) if parts else np.zeros(0, np.int64)

    return (cat(positions), cat(minors), cat(feats), cat(qstrats),
            ins_pos, ins_len)


def calculate_pileup(records, chrom_id: int, start: int, end: int,
                     num_homop: int = 5, min_mapq: int = 1,
                     weibull_summation: bool = False, dtypes=None):
    """Counts matrix for region [start, end) of reference chrom_id.

    Returns dict(major [C], minor [C], matrix [C, featlen*num_dtypes*
    num_homop] int64) where C = positions-with-coverage + expanded
    insertion columns, matching print_pileup_data's row layout.

    dtypes: optional list of read-name prefixes (medaka num_dtypes > 1,
    medaka_counts.c:401-426 adapted to the driver's prefix convention);
    the feature axis becomes dtype-major (featlen*dtype*num_homop +
    featlen*qstrat + base).  A read matching no prefix raises ValueError
    (the reference exits(1)).
    """
    num_dtypes = len(dtypes) if dtypes else 1
    all_pos, all_min, all_feat, all_q = [], [], [], []
    all_w = []
    all_dt = []
    bad_reads: set = set()
    ins_map: dict[int, int] = {}
    cover = np.zeros(end - start, dtype=bool)
    kept = [rec for rec in records
            if rec.ref_id == chrom_id and not (rec.flag & FILTER_FLAGS)
            and rec.mapq >= min_mapq]

    def _mark_cover(rec):
        span = sum(ln for op, ln in rec.cigar if op in "MDN=X")
        s = max(rec.pos, start)
        e = min(rec.pos + span, end)
        if e > s:
            cover[s - start : e - start] = True

    nat = None
    if not weibull_summation:
        from ..io.native import pileup_events_native

        nat = pileup_events_native(kept, NUM2COUNTBASE, FWD_DEL, REV_DEL,
                                   num_homop)
    if nat is not None:
        # batched C++ event extraction (native/pileup_events.cpp; contract
        # = the per-record fast path below, tested equal)
        npos, nmin, nfeat, nq, rec_id, nip, nil = nat
        all_pos.append(npos)
        all_min.append(nmin)
        all_feat.append(nfeat)
        all_q.append(nq)
        if num_dtypes > 1:
            per_rec_dt = np.empty(len(kept), np.int64)
            for ri, rec in enumerate(kept):
                dt = next((i for i, pre in enumerate(dtypes)
                           if rec.name.startswith(pre)), None)
                if dt is None:
                    raise ValueError(f"Datatype not found for {rec.name}")
                per_rec_dt[ri] = dt
            all_dt.append(per_rec_dt[rec_id])
        for a, b in zip(nip.tolist(), nil.tolist()):
            if start <= a < end:
                ins_map[a] = max(ins_map.get(a, 0), b)
        for rec in kept:
            _mark_cover(rec)
        kept = []  # the loop below is skipped

    for rec in kept:
        if weibull_summation:
            p, mnr, f, q, ip, il, ws = read_events(
                rec, num_homop, weibull=True, bad_reads=bad_reads)
            all_w.extend(ws)
        else:
            p, mnr, f, q, ip, il = read_events(rec, num_homop)
        if num_dtypes > 1:
            dt = next((i for i, pre in enumerate(dtypes)
                       if rec.name.startswith(pre)), None)
            if dt is None:
                raise ValueError(f"Datatype not found for {rec.name}")
            all_dt.append(np.full(len(p), dt, np.int64))
        all_pos.append(np.asarray(p, np.int64))
        all_min.append(np.asarray(mnr, np.int64))
        all_feat.append(np.asarray(f, np.int64))
        all_q.append(np.asarray(q, np.int64))
        for a, b in zip(ip, il):
            if start <= a < end:
                ins_map[a] = max(ins_map.get(a, 0), b)
        # coverage: every ref position the read overlaps (incl. deletions)
        _mark_cover(rec)

    return _assemble_pileup(all_pos, all_min, all_feat, all_q, all_dt,
                            all_w, ins_map, cover, start, end, num_homop,
                            num_dtypes, weibull_summation)


def _assemble_pileup(all_pos, all_min, all_feat, all_q, all_dt, all_w,
                     ins_map, cover, start, end, num_homop, num_dtypes,
                     weibull_summation):
    """Shared tail of calculate_pileup / calculate_pileup_region: event
    streams + coverage + insertion widths -> (major, minor, matrix)."""

    def _cat(parts):
        return (np.concatenate(parts) if parts
                else np.zeros(0, np.int64))

    pos = _cat(all_pos)
    keep = (pos >= start) & (pos < end)
    pos = pos[keep]
    minors = _cat(all_min)[keep]
    feats = _cat(all_feat)[keep]
    qstrats = _cat(all_q)[keep]
    if num_dtypes > 1:
        dts = _cat(all_dt)[keep]
        feats = feats + FEATLEN * num_homop * dts  # dtype-major offset

    covered_positions = np.nonzero(cover)[0] + start
    width = np.ones(len(covered_positions), dtype=np.int64)
    pos_to_slot = {int(p): i for i, p in enumerate(covered_positions)}
    for a, b in ins_map.items():
        if a in pos_to_slot:
            width[pos_to_slot[a]] = b + 1
    col_start = np.concatenate([[0], np.cumsum(width)])
    n_cols = int(col_start[-1])

    major = np.repeat(covered_positions, width)
    minor = np.arange(n_cols) - np.repeat(col_start[:-1], width)

    matrix = np.zeros((n_cols, FEATLEN * num_dtypes * num_homop), dtype=np.int64)
    if len(pos):
        # covered_positions is sorted and every event position is covered
        slot = np.searchsorted(covered_positions, pos)
        col = col_start[slot] + minors
        # drop events in minor columns beyond the column width (insertions
        # whose anchor's max_ins came only from filtered-out regions can't
        # happen; guard anyway)
        ok = minors < width[slot]
        if weibull_summation:
            wmat = np.asarray(all_w, dtype=np.float64)[keep][ok] * 10000.0
            fmat = np.zeros((n_cols, FEATLEN * num_dtypes * num_homop), np.float64)
            for qs in range(num_homop):
                np.add.at(fmat, (col[ok], feats[ok] + FEATLEN * qs), wmat[:, qs])
            # float accumulation, floored once at the end (the reference's
            # size_t += float truncates per add; that path is unreachable
            # from its driver, which hard-codes weibull_summation=false)
            matrix = fmat.astype(np.int64)
        else:
            fidx = feats + FEATLEN * qstrats
            # histogram on the flattened (col, feature) index: same result
            # as np.add.at but one bincount pass (~10x on 600k events)
            w = FEATLEN * num_dtypes * num_homop
            flat = col[ok] * w + fidx[ok]
            matrix = np.bincount(flat, minlength=n_cols * w).reshape(
                n_cols, w).astype(np.int64, copy=False)
    return {"major": major, "minor": minor, "matrix": matrix, "n_cols": n_cols}


def calculate_pileup_region(bam_path: str, chrom: str, start: int,
                            end: int, index=None, num_homop: int = 5,
                            min_mapq: int = 1, dtypes=None,
                            refs=None):
    """Fused BAM-region pileup: native .bai-bounded decode straight into
    the native event extractor — no Python record objects anywhere
    (the record-object round-trip made the end-to-end path 4x slower
    than medaka_counts+htslib, REF_BASELINE pileup row).  Identical
    output to read_bam_region + calculate_pileup (tests assert it).
    Returns None when the native lib isn't built; `refs`/`index` are
    optional preloaded read_bam_header/read_bai results."""
    from ..io import bam as B
    from ..io.native import (pileup_events_cols_native,
                             read_bam_region_native)

    if index is None:
        index = B.read_bai(bam_path + ".bai")
    if refs is None:
        with open(bam_path, "rb") as f:
            refs = B.read_bam_header_stream(B.BgzfStream(f))
    names = [r[0] for r in refs]
    if chrom not in names:
        return {"major": np.zeros(0, np.int64),
                "minor": np.zeros(0, np.int64),
                "matrix": np.zeros((0, FEATLEN * num_homop), np.int64),
                "n_cols": 0}
    ref_id = names.index(chrom)
    bins, ioffsets = index[ref_id]
    chunks = [c for b in B._reg2bins(start, end) for c in bins.get(b, [])]
    if not chunks:
        return {"major": np.zeros(0, np.int64),
                "minor": np.zeros(0, np.int64),
                "matrix": np.zeros((0, FEATLEN * num_homop), np.int64),
                "n_cols": 0}
    min_off = min(c[0] for c in chunks)
    win = start >> 14
    if win < len(ioffsets) and ioffsets[win] > 0:
        min_off = max(min_off, int(ioffsets[win]))
    max_off = max(c[1] for c in chunks)
    cols = read_bam_region_native(bam_path, int(min_off), int(max_off),
                                  ref_id, start, end,
                                  filter_flags=FILTER_FLAGS,
                                  min_mapq=min_mapq)
    if cols is None:
        return None
    n = len(cols["pos"])
    num_dtypes = len(dtypes) if dtypes else 1

    if num_dtypes == 1:
        # fully native: events + coverage + widths + histogram in C
        from ..io.native import pileup_matrix_native

        nat = pileup_matrix_native(cols, start, end, NUM2COUNTBASE,
                                   FWD_DEL, REV_DEL, num_homop, FEATLEN)
        if nat is not None:
            major, minor, matrix = nat
            return {"major": major, "minor": minor, "matrix": matrix,
                    "n_cols": len(major)}

    cover = np.zeros(end - start, dtype=bool)
    if n:
        s = np.clip(cols["pos"].astype(np.int64) - start, 0, end - start)
        e = np.clip(cols["pos"].astype(np.int64)
                    + np.maximum(cols["span"].astype(np.int64), 0) - start,
                    0, end - start)
        delta = np.zeros(end - start + 1, np.int64)
        np.add.at(delta, s, 1)
        np.add.at(delta, e, -1)
        cover = np.cumsum(delta[:-1]) > 0

    nat = pileup_events_cols_native(
        cols["seq_nt16"], cols["qual"], cols["seq_off"], cols["cigar"],
        cols["cigar_off"], cols["pos"].astype(np.int64),
        ((cols["flag"] & 16) != 0).astype(np.uint8),
        NUM2COUNTBASE, FWD_DEL, REV_DEL, num_homop)
    if nat is None:
        return None
    npos, nmin, nfeat, nq, rec_id, nip, nil = nat
    ins_map: dict[int, int] = {}
    for a, b in zip(nip.tolist(), nil.tolist()):
        if start <= a < end:
            ins_map[a] = max(ins_map.get(a, 0), b)
    all_dt = []
    if num_dtypes > 1:
        name_off = cols["name_off"]
        names_blob = cols["names"]
        per_rec_dt = np.empty(n, np.int64)
        for ri in range(n):
            nm = names_blob[name_off[ri]:name_off[ri + 1]].decode()
            dt = next((i for i, pre in enumerate(dtypes)
                       if nm.startswith(pre)), None)
            if dt is None:
                raise ValueError(f"Datatype not found for {nm}")
            per_rec_dt[ri] = dt
        all_dt.append(per_rec_dt[rec_id])
    return _assemble_pileup([npos], [nmin], [nfeat], [nq], all_dt, [],
                            ins_map, cover, start, end, num_homop,
                            num_dtypes, False)


def print_pileup(result, num_homop: int = 5, out=None):
    """print_pileup_data text format (medaka_counts.c:203-229).

    Formats the whole matrix in one vectorized pass (the per-row
    f-string loop was ~60% of whole-contig CLI wall time at prom-BAM
    scale); output is byte-identical to the row-at-a-time version.
    """
    import sys

    import numpy as np

    out = out or sys.stdout
    header = "pos\tins\t" + "".join(
        f"{b}.{k + 1}\t" for k in range(num_homop) for b in PLP_BASES
    )
    out.write(header + "depth\n")
    n = result["n_cols"]
    if not n:
        return
    mat = np.asarray(result["matrix"][:n], np.int64)
    cols = np.column_stack([
        np.asarray(result["major"][:n], np.int64),
        np.asarray(result["minor"][:n], np.int64),
        mat,
        mat.sum(axis=1),
    ])
    out.write("\n".join("\t".join(map(str, r)) for r in cols.tolist()))
    out.write("\n")
