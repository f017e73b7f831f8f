"""f5c eventalign-mode postprocessing vs reference-built goldens.

tests/fixtures/eventalign_golden.json is produced by the reference's OWN
align.c/eventalign.c (tools/golden/eventalign_harness.cpp): per-read QC
status flags, recalibrated scalings, alignment summaries and the verbatim
emit_event_alignment_tsv rows.  The test drives this framework's full
chain — event detection, MoM scaling, ABEA align, postalign, WLS
recalibration, QC, reference-space profile-HMM realign, TSV emit — from
the same raw inputs and asserts byte/bit equality.
"""

import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.io import bam as B
from genomicsbench_palisade_tpu.ops.oracle import abea as OA
from genomicsbench_palisade_tpu.ops.oracle import eventalign as EA
from genomicsbench_palisade_tpu.ops.oracle import events as E

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "eventalign_golden.json"
SAMPLE_RATE = 4000.0


def _load_cases():
    with open(FIXTURE) as f:
        return json.load(f)["cases"]


def _model():
    import itertools

    kmers = ["".join(p) for p in itertools.product("ACGT", repeat=6)]
    levels = np.array(
        [60.0 + 80.0 * ((i * 2654435761) % 4096) / 4096.0
         for i in range(len(kmers))])
    # the generator writes the TSV with %.2f — the harness re-parses it, so
    # quantize the same way
    mean = np.array([float(f"{x:.2f}") for x in levels], np.float32)
    stdv = np.full(len(kmers), 1.50, np.float32)
    return {"level_mean": mean, "level_stdv": stdv,
            "level_log_stdv": np.float32(
                np.log(np.float64(stdv)))}


def _f32_hex(h):
    return np.float32(float.fromhex(h))


def _bam_records(case):
    idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
    rows = []
    for rd in case["reads"]:
        rows.append((rd, B.BamRecord(
            name=rd["qname"], flag=rd["flag"], ref_id=0, pos=rd["pos"],
            mapq=rd["mapq"], cigar=[tuple(c) for c in rd["cigar"]],
            seq_nt16=np.array([idx16[ch] for ch in rd["query"]], np.uint8),
            qual=np.full(len(rd["query"]), 30, np.uint8),
            tags={"NM": rd["nm"]})))
    rows.sort(key=lambda t: t[1].pos)
    return rows


def _run_read(genome, rd, record, read_idx, model, use_native):
    """The framework's per-read eventalign chain; mirrors the harness."""
    from genomicsbench_palisade_tpu.ops import eventalign as PE

    sig = np.array([float(x) for x in rd["signal"]], np.float32)
    events = E.getevents(sig)
    seq = rd["fastq"]
    shift, scale = E.estimate_scalings_using_mom(seq, model, events)
    pairs = OA.align(seq, events["mean"], model, float(scale), float(shift))
    status, sc, b2e, epb = EA.scaling_read(seq, events, pairs, model)
    out = {"status": status}
    if status:
        return out
    out["scale"] = sc
    out["events_per_base"] = epb
    ref_len = B._cigar_ref_len(record.cigar)
    ref_segment = genome[record.pos:record.pos + ref_len]
    alignments = PE.realign_read(
        record, ref_segment, record.pos, len(seq), events, sc, model,
        b2e, epb, read_idx, use_native=use_native)
    out["summary"] = EA.summarize_alignment(
        events, model, sc, alignments, SAMPLE_RATE,
        nm=record.tags.get("NM", 0))
    out["tsv"] = EA.emit_tsv_lines(
        events, model, sc, alignments, read_idx, record.name, "ctg1",
        SAMPLE_RATE)
    return out


# native engine covers every case; the (slow) Python oracle spec re-proves
# a rotating subset so the suite stays bounded
_ORACLE_CASES = (0, 7, 13, 19, 24)


@pytest.mark.parametrize("ci", range(len(_load_cases())))
def test_eventalign_golden(ci):
    from genomicsbench_palisade_tpu.io.native import available

    case = _load_cases()[ci]
    model = _model()
    rows = _bam_records(case)
    use_native = available() and ci not in _ORACLE_CASES
    if not available() and ci not in _ORACLE_CASES:
        pytest.skip("native lib not built; oracle subset only")
    results = iter(case["results"])
    read_index = 0
    n_checked = 0
    for rd, record in rows:
        read_idx = read_index
        read_index += 1
        if record.flag & 0x4 or record.mapq < 20 or record.flag & 0x100:
            continue
        want = next(results)
        assert want["qname"] == record.name
        assert want["read_idx"] == read_idx
        got = _run_read(case["genome"], rd, record, read_idx, model,
                        use_native)
        assert got["status"] == want["status"], record.name
        if want["status"]:
            continue
        w_shift, w_scale, w_var, w_epb = want["scale"]
        assert got["scale"]["shift"] == _f32_hex(w_shift)
        assert got["scale"]["scale"] == _f32_hex(w_scale)
        assert got["scale"]["var"] == _f32_hex(w_var)
        assert got["events_per_base"] == float.fromhex(w_epb)
        s = got["summary"]
        wn = want["summary"]
        assert [s["num_events"], s["num_steps"], s["num_skips"],
                s["num_stays"]] == [int(x) for x in wn[:4]]
        assert s["sum_duration"] == float.fromhex(wn[4])
        assert s["sum_z_score"] == float.fromhex(wn[5])
        assert s["alignment_edit_distance"] == int(wn[6])
        assert s["reference_span"] == int(wn[7])
        got_tsv = [l.rstrip("\n") for l in got["tsv"]]
        assert got_tsv == want["tsv"], (
            f"{record.name}: first diff at "
            f"{next((i for i, (a, b) in enumerate(zip(got_tsv, want['tsv'])) if a != b), 'len')}"
        )
        n_checked += 1
    assert next(results, None) is None


def test_emit_tsv_arrays_matches_dict_path():
    """emit_tsv_lines_arrays (raw realign arrays -> vectorized kmer
    columns) is byte-identical to the dict-interface chain
    (realign_read -> oracle emit_tsv_lines) on every golden read —
    incl. rc reads (complement LUT) and B states (N^k model kmers)."""
    from genomicsbench_palisade_tpu.io.native import available
    from genomicsbench_palisade_tpu.ops import eventalign as PE

    if not available():
        pytest.skip("native lib not built")
    model = _model()
    n_checked = n_rc = n_b = 0
    for case in _load_cases():
        genome = case["genome"]
        for rd, record in _bam_records(case):
            if record.flag & 0x4 or record.mapq < 20 or record.flag & 0x100:
                continue
            sig = np.array([float(x) for x in rd["signal"]], np.float32)
            events = E.getevents(sig)
            seq = rd["fastq"]
            shift, scale = E.estimate_scalings_using_mom(seq, model, events)
            pairs = OA.align(seq, events["mean"], model, float(scale),
                             float(shift))
            status, sc, b2e, epb = EA.scaling_read(seq, events, pairs, model)
            if status:
                continue
            ref_len = B._cigar_ref_len(record.cigar)
            ref_segment = genome[record.pos:record.pos + ref_len]
            res = PE.realign_read_arrays(
                record, ref_segment, record.pos, len(seq), events, sc,
                model, b2e, epb)
            assert res is not None
            rp, ei, st, ref_seq = res
            got = PE.emit_tsv_lines_arrays(
                events, model, sc, rp, ei, st, ref_seq, record.pos,
                record.is_reverse, 0, record.name, "ctg1", SAMPLE_RATE)
            blk = PE.emit_tsv_text_arrays(
                events, model, sc, rp, ei, st, ref_seq, record.pos,
                record.is_reverse, 0, record.name, "ctg1", SAMPLE_RATE)
            assert blk is not None
            assert blk[0] == "".join(got) and blk[1] == len(got)
            alignments = PE.realign_read(
                record, ref_segment, record.pos, len(seq), events, sc,
                model, b2e, epb, 0)
            want = EA.emit_tsv_lines(
                events, model, sc, alignments, 0, record.name, "ctg1",
                SAMPLE_RATE)
            assert got == want, record.name
            n_checked += 1
            n_rc += int(record.is_reverse)
            n_b += int(bytes(st).count(b"B") > 0)
    assert n_checked and n_rc and n_b  # both branches exercised


def test_native_emit_float_corners():
    """gt_eventalign_emit formats inf/-inf/nan/-nan/-0.0 exactly like
    Python's f-strings (glibc would print '-nan'; the guard strips the
    sign)."""
    from genomicsbench_palisade_tpu.io.native import (available,
                                                      eventalign_emit_native)

    if not available():
        pytest.skip("native lib not built")
    vals = np.array([np.inf, -np.inf, np.nan, -np.nan, -0.0, 0.005,
                     -0.005, 123.455, 1e18], np.float64)
    n = len(vals)
    rp = np.arange(n, dtype=np.int32)
    ei = np.arange(n, dtype=np.int32)
    kb = b"ACGTAC" * n
    text = eventalign_emit_native(rp, ei, kb, kb, 6, vals, vals, vals,
                                  vals, vals, vals, "ctg", "7")
    want = "".join(
        f"ctg\t{i}\tACGTAC\t7\tt\t{i}\t{v:.2f}\t{v:.3f}\t{v:.5f}\t"
        f"ACGTAC\t{v:.2f}\t{v:.2f}\t{v:.2f}\n"
        for i, v in enumerate(vals.tolist()))
    assert text == want


def test_aligned_segments_cigar_walk():
    """get_aligned_segments semantics on a mixed cigar
    (eventalign.c:1112-1180)."""
    rec = B.BamRecord("r", 0, 0, 100, 60,
                      [("S", 2), ("M", 3), ("I", 2), ("M", 1), ("D", 2),
                       ("M", 1), ("N", 5), ("M", 2), ("H", 3)],
                      np.zeros(9, np.uint8), np.zeros(9, np.uint8), {})
    segs = EA.get_aligned_segments(rec)
    assert segs == [
        [(100, 2), (101, 3), (102, 4), (103, 7), (106, 8)],
        [(112, 9), (113, 10)],
    ]


def test_eventalign_cli_bam_mode(tmp_path, capsys):
    """The f5c-surface CLI (-b/-g/-r) reproduces the reference TSV rows
    for a golden case end-to-end (files on disk, BAM via io.bam writer)."""
    case = _load_cases()[1]
    rows = _bam_records(case)
    bam = tmp_path / "reads.bam"
    B.write_bam(str(bam), [("ctg1", len(case["genome"]))],
                [r for _, r in rows])
    (tmp_path / "genome.fa").write_text(">ctg1\n" + case["genome"] + "\n")
    with open(tmp_path / "reads.fq", "w") as f:
        for rd in case["reads"]:
            f.write(f"@{rd['qname']}\n{rd['fastq']}\n+\n"
                    + "I" * len(rd["fastq"]) + "\n")
    np.savez(tmp_path / "sig.npz", **{
        rd["qname"]: np.array([float(x) for x in rd["signal"]], np.float32)
        for rd in case["reads"]})
    import itertools
    levels = _model()
    with open(tmp_path / "pore.tsv", "w") as f:
        f.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, p in enumerate(itertools.product("ACGT", repeat=6)):
            f.write(f"{''.join(p)}\t{levels['level_mean'][i]:.2f}\t1.50\n")

    from genomicsbench_palisade_tpu.cli.abea import main as abea_main
    out_tsv = tmp_path / "events.tsv"
    rc = abea_main(["-r", str(tmp_path / "reads.fq"),
                    "--raw", str(tmp_path / "sig.npz"),
                    "--model", str(tmp_path / "pore.tsv"),
                    "-b", str(bam), "-g", str(tmp_path / "genome.fa"),
                    "-B", "3.7M", "-o", str(out_tsv)])
    assert rc == 0
    got = out_tsv.read_text().splitlines()
    assert got[0].startswith("contig\tposition\treference_kmer")
    want = [t for r in case["results"] for t in r["tsv"]]
    assert got[1:] == want


def test_eventalign_cli_region_window(tmp_path, capsys):
    """-w ctg:start-end limits processing to the region (f5c -w: region
    BAM iteration + aligned-pair clipping)."""
    case = _load_cases()[1]
    rows = _bam_records(case)
    bam = tmp_path / "reads.bam"
    B.write_bam(str(bam), [("ctg1", len(case["genome"]))],
                [r for _, r in rows])
    (tmp_path / "genome.fa").write_text(">ctg1\n" + case["genome"] + "\n")
    with open(tmp_path / "reads.fq", "w") as f:
        for rd in case["reads"]:
            f.write(f"@{rd['qname']}\n{rd['fastq']}\n+\n"
                    + "I" * len(rd["fastq"]) + "\n")
    np.savez(tmp_path / "sig.npz", **{
        rd["qname"]: np.array([float(x) for x in rd["signal"]], np.float32)
        for rd in case["reads"]})
    import itertools
    levels = _model()
    with open(tmp_path / "pore.tsv", "w") as f:
        f.write("kmer\tlevel_mean\tlevel_stdv\n")
        for i, p in enumerate(itertools.product("ACGT", repeat=6)):
            f.write(f"{''.join(p)}\t{levels['level_mean'][i]:.2f}\t1.50\n")

    from genomicsbench_palisade_tpu.cli.abea import main as abea_main
    # pick a window inside the first kept read's span
    first = next(r for _, r in rows if not (r.flag & 0x104) and r.mapq >= 20)
    beg1 = first.pos + 30  # 1-based input
    end1 = first.pos + 230
    out_tsv = tmp_path / "win.tsv"
    rc = abea_main(["-r", str(tmp_path / "reads.fq"),
                    "--raw", str(tmp_path / "sig.npz"),
                    "--model", str(tmp_path / "pore.tsv"),
                    "-b", str(bam), "-g", str(tmp_path / "genome.fa"),
                    "-w", f"ctg1:{beg1}-{end1}", "-o", str(out_tsv)])
    assert rc == 0
    body = out_tsv.read_text().splitlines()[1:]
    assert body, "window produced no rows"
    positions = [int(l.split("\t")[1]) for l in body]
    assert min(positions) >= beg1 - 1 and max(positions) <= end1
