"""BAM IO roundtrip + pileup counting on hand-constructed alignments."""

import numpy as np

from genomicsbench_palisade_tpu.io import bam as B
from genomicsbench_palisade_tpu.ops import pileup as P


def _nt16(s):
    idx = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
    return np.array([idx[c] for c in s], dtype=np.uint8)


def _rec(name, pos, cigar, seq, flag=0, mapq=60):
    return B.BamRecord(
        name=name, flag=flag, ref_id=0, pos=pos, mapq=mapq, cigar=cigar,
        seq_nt16=_nt16(seq), qual=np.full(len(seq), 30, np.uint8), tags={},
    )


def test_bam_roundtrip(tmp_path):
    refs = [("tig1", 1000)]
    recs = [
        _rec("r1", 10, [("M", 4)], "ACGT"),
        _rec("r2", 12, [("M", 2), ("I", 2), ("M", 2)], "GTAACA", flag=16),
        _rec("r3", 5, [("S", 2), ("M", 3), ("D", 2), ("M", 1)], "TTACGA"),
    ]
    path = str(tmp_path / "toy.bam")
    B.write_bam(path, refs, recs)
    refs2, recs2 = B.read_bam(path)
    assert refs2 == refs
    assert len(recs2) == 3
    for a, b in zip(recs, recs2):
        assert a.name == b.name and a.pos == b.pos and a.cigar == b.cigar
        np.testing.assert_array_equal(a.seq_nt16, b.seq_nt16)
        assert a.flag == b.flag


def test_pileup_counts_simple():
    # two forward reads, one reverse, ref positions 10..13
    recs = [
        _rec("f1", 10, [("M", 4)], "ACGT"),
        _rec("f2", 10, [("M", 4)], "ACGA"),
        _rec("rv", 10, [("M", 4)], "ACGT", flag=16),
    ]
    res = P.calculate_pileup(recs, 0, 10, 14, num_homop=1)
    assert res["n_cols"] == 4
    mat = res["matrix"]
    # feature order acgtACGT dD; qual layer single
    A, C, G, T = 4, 5, 6, 7
    a, c, g, t = 0, 1, 2, 3
    assert mat[0, A] == 2 and mat[0, a] == 1
    assert mat[1, C] == 2 and mat[1, c] == 1
    assert mat[2, G] == 2 and mat[2, g] == 1
    assert mat[3, T] == 1 and mat[3, A] == 1 and mat[3, t] == 1


def test_pileup_insertion_and_deletion():
    # read with a 2-base insertion after ref pos 11 and a deletion at 12
    recs = [
        _rec("i1", 10, [("M", 2), ("I", 2), ("M", 2)], "ACGGTT"),
        _rec("d1", 10, [("M", 2), ("D", 1), ("M", 1)], "ACT"),
    ]
    res = P.calculate_pileup(recs, 0, 10, 14, num_homop=1)
    # columns: 10.0, 11.0, 11.1, 11.2, 12.0, 13.0
    np.testing.assert_array_equal(res["major"], [10, 11, 11, 11, 12, 13])
    np.testing.assert_array_equal(res["minor"], [0, 0, 1, 2, 0, 0])
    mat = res["matrix"]
    A, C, G, T, D = 4, 5, 6, 7, 9
    assert mat[1, C] == 2  # both reads C at 11
    assert mat[2, G] == 1 and mat[3, G] == 1  # inserted GG
    assert mat[4, D] == 1  # deletion in read d1 at 12
    assert mat[4, T] == 1  # read i1 has T at 12
    assert mat[5, T] == 2  # read i1 T at 13 and read d1's final M is T at 13


def test_pileup_filters():
    recs = [
        _rec("ok", 10, [("M", 2)], "AC"),
        _rec("sec", 10, [("M", 2)], "AC", flag=B.FSECONDARY),
        _rec("dup", 10, [("M", 2)], "AC", flag=B.FDUP),
        _rec("mq0", 10, [("M", 2)], "AC", mapq=0),
    ]
    res = P.calculate_pileup(recs, 0, 10, 12, num_homop=1)
    assert res["matrix"][:, 4].tolist() == [1, 0]  # only "ok" counted


def test_weibull_summation():
    """Weibull homopolymer partial counts (medaka _get_weibull_scores)."""
    import numpy as np
    from genomicsbench_palisade_tpu.io.bam import BamRecord
    from genomicsbench_palisade_tpu.ops.pileup import (
        calculate_pileup, weibull_fractions)

    # fractions: valid distribution over strata (sums < 1, nonneg)
    fr = weibull_fractions(scale=2.0, shape=1.5, num_homop=5)
    assert np.all(fr >= 0) and fr.sum() <= 1.0 + 1e-9
    # x=1 term: -exp(0)*expm1(0 - (1/2)^1.5) = 1 - exp(-(0.5)^1.5)
    want0 = -np.exp(-0.0) * np.expm1(0.0 - (1 / 2.0) ** 1.5)
    np.testing.assert_allclose(fr[0], want0, rtol=1e-12)

    ln = 10
    rng = np.random.default_rng(0)
    seq = rng.choice([1, 2, 4, 8], ln).astype(np.uint8)  # ACGT nt16
    rec = BamRecord(
        "r0", 0, 0, 5, 60, [("M", ln)], seq,
        np.full(ln, 30, np.uint8),
        {"WL": np.full(ln, 2.0, np.float32), "WK": np.full(ln, 1.5, np.float32)},
    )
    out = calculate_pileup([rec], 0, 0, 100, num_homop=5, weibull_summation=True)
    # each base contributes floor-summed 10000*fr across its 5 strata
    row = out["matrix"][0]
    assert row.sum() > 0
    # the per-base stratum profile matches 10000*fr
    base_i = row.reshape(5, 10)  # [qstrat, feat]
    nz = base_i.sum(axis=1)
    np.testing.assert_allclose(nz, np.floor(10000 * fr + 1e-9), atol=1)

    # missing tags -> zero contributions, no crash
    rec2 = BamRecord("r1", 0, 0, 5, 60, [("M", ln)], seq,
                     np.full(ln, 30, np.uint8), {})
    out2 = calculate_pileup([rec2], 0, 0, 100, num_homop=5,
                            weibull_summation=True)
    assert out2["matrix"].sum() == 0


def test_multi_dtype_pileup():
    """num_dtypes > 1: read-name prefixes route counts to dtype blocks."""
    import numpy as np
    import pytest
    from genomicsbench_palisade_tpu.io.bam import BamRecord
    from genomicsbench_palisade_tpu.ops.pileup import FEATLEN, calculate_pileup

    def rec(name, pos):
        return BamRecord(name, 0, 0, pos, 60, [("M", 4)],
                         np.array([1, 2, 4, 8], np.uint8),
                         np.full(4, 30, np.uint8), {})

    out = calculate_pileup([rec("ont_a", 0), rec("pb_b", 0)], 0, 0, 50,
                           num_homop=1, dtypes=["ont", "pb"])
    m = out["matrix"]
    assert m.shape[1] == FEATLEN * 2 * 1
    # both reads aligned identically: dtype 0 block == dtype 1 block
    np.testing.assert_array_equal(m[:, :FEATLEN], m[:, FEATLEN:])
    assert m.sum() == 8
    with pytest.raises(ValueError):
        calculate_pileup([rec("xx_a", 0)], 0, 0, 50, num_homop=1,
                         dtypes=["ont", "pb"])


def test_read_events_fast_matches_slow():
    """Vectorized read_events == the per-base loop (the weibull-path spec)
    on randomized cigars incl. insertions after M and D, skips, Ns."""
    import numpy as np

    from genomicsbench_palisade_tpu.io.bam import BamRecord
    from genomicsbench_palisade_tpu.ops import pileup as P

    rng = np.random.default_rng(8)
    for t in range(30):
        cigar = []
        qlen = rlen = 0
        for _ in range(int(rng.integers(1, 8))):
            op = str(rng.choice(list("MIDSN=X")))
            ln = int(rng.integers(1, 30))
            if cigar and cigar[-1][0] == op:
                continue
            cigar.append((op, ln))
            if op in "MIS=X":
                qlen += ln
            if op in "MDN=X":
                rlen += ln
        if not any(op in "M=X" for op, _ in cigar):
            continue
        rec = BamRecord(
            f"r{t}", 16 if rng.random() < 0.5 else 0, 0,
            int(rng.integers(0, 50)), 60, cigar,
            rng.integers(1, 16, qlen).astype(np.uint8),
            rng.integers(0, 40, qlen).astype(np.uint8), {})
        fast = P.read_events(rec, 5)
        slow = P.read_events(rec, 5, weibull=True, bad_reads=set())  # spec
        for a, b in zip(fast[:4], slow[:4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert list(fast[4]) == list(slow[4])
        assert list(fast[5]) == list(slow[5])


def test_native_events_match_python(monkeypatch):
    """calculate_pileup with native extraction == pure-Python path on
    randomized cigars and dtypes."""
    import pytest

    from genomicsbench_palisade_tpu.io import native as N
    from genomicsbench_palisade_tpu.io.bam import BamRecord
    from genomicsbench_palisade_tpu.ops import pileup as P

    if not N.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(12)
    recs = []
    for i in range(40):
        cigar = []
        qlen = 0
        for _ in range(int(rng.integers(1, 6))):
            op = str(rng.choice(list("MIDS")))
            ln = int(rng.integers(1, 25))
            if cigar and cigar[-1][0] == op:
                continue
            cigar.append((op, ln))
            if op in "MIS":
                qlen += ln
        if not any(op == "M" for op, _ in cigar):
            cigar.insert(0, ("M", 10))
            qlen += 10
        recs.append(BamRecord(
            f"dt{i % 2}_r{i}", 16 if rng.random() < 0.5 else 0, 0,
            int(rng.integers(0, 300)), 60, cigar,
            rng.integers(1, 16, qlen).astype(np.uint8),
            rng.integers(0, 40, qlen).astype(np.uint8), {}))
    for dtypes in (None, ["dt0", "dt1"]):
        got = P.calculate_pileup(recs, 0, 0, 400, dtypes=dtypes)
        monkeypatch.setattr(N, "pileup_events_native", lambda *a: None)
        want = P.calculate_pileup(recs, 0, 0, 400, dtypes=dtypes)
        monkeypatch.undo()
        np.testing.assert_array_equal(got["matrix"], want["matrix"])
        np.testing.assert_array_equal(got["major"], want["major"])
        np.testing.assert_array_equal(got["minor"], want["minor"])
