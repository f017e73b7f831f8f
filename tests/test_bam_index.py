"""Indexed BAM region access: .bai parsing, streaming BGZF, index build.

fixtures/indexed_bam/ holds a BAM written by io/bam.py and a .bai built
by htslib's sam_index_build — parsing the htslib index cross-validates
our .bai reader against the reference tool family's own indexer
(medaka_counts.c:330-340 relies on these iterators).
"""

import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.io import bam as B

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "indexed_bam"
BAM = str(FIXDIR / "toy.bam")

REGIONS = [(0, 500), (1, 2), (40_000, 55_000), (100_000, 100_001),
           (149_000, 160_000), (0, 160_000)]


def _want(allrecs, beg, end):
    return [r.name for r in allrecs
            if r.pos < end
            and r.pos + max(sum(l for op, l in r.cigar
                                if op in "MDN=X"), 1) > beg]


@pytest.fixture(scope="module")
def whole():
    return B.read_bam(BAM)


def test_region_reads_htslib_index(whole):
    refs, allrecs = whole
    for beg, end in REGIONS:
        _, got = B.read_bam_region(BAM, "tig1", beg, end)
        assert [r.name for r in got] == _want(allrecs, beg, end), (beg, end)


def test_region_reads_own_index(tmp_path, whole):
    refs, allrecs = whole
    bai = str(tmp_path / "own.bai")
    B.build_bai(BAM, bai)
    for beg, end in REGIONS:
        _, got = B.read_bam_region(BAM, "tig1", beg, end, bai_path=bai)
        assert [r.name for r in got] == _want(allrecs, beg, end), (beg, end)


def test_region_record_contents_match(whole):
    _, allrecs = whole
    beg, end = 40_000, 55_000
    _, got = B.read_bam_region(BAM, "tig1", beg, end)
    by_name = {r.name: r for r in allrecs}
    for r in got:
        w = by_name[r.name]
        assert r.pos == w.pos and r.cigar == w.cigar and r.flag == w.flag
        np.testing.assert_array_equal(r.seq_nt16, w.seq_nt16)
        np.testing.assert_array_equal(r.qual, w.qual)


@pytest.mark.parametrize("region", [
    "tig1:40001-55000",    # single 100 kb chunk
    "tig1:30001-160000",   # spans two chunks: per-chunk indexed re-query
])
def test_pileup_cli_indexed_equals_whole(tmp_path, capsys, region):
    """The pileup driver produces identical matrices with and without
    the index present (with .bai it re-queries the index PER 100 kb
    chunk, the reference's per-chunk htslib iterator structure)."""
    import shutil

    from genomicsbench_palisade_tpu.cli.pileup import main as pileup_main

    rc = pileup_main([BAM, region, "1"])
    assert rc == 0
    indexed = capsys.readouterr().out

    noidx_bam = tmp_path / "noidx.bam"
    shutil.copyfile(BAM, noidx_bam)
    rc = pileup_main([str(noidx_bam), region, "1"])
    assert rc == 0
    whole_out = capsys.readouterr().out
    assert indexed == whole_out


def test_read_bam_region_native_matches_python(tmp_path):
    """The native-backed read_bam_region must return records identical
    to the pure-Python region reader (names, cigars, seqs, quals)."""
    import genomicsbench_palisade_tpu.io.bam as B
    from genomicsbench_palisade_tpu.io.native import available

    if not available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(83)
    ref_len = 5000
    idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
    rows = []
    for i, p in enumerate(np.sort(rng.integers(0, ref_len - 80, 60))):
        L = int(rng.integers(20, 70))
        seq = rng.integers(0, 4, L)
        cig = [("S", 3), ("M", L - 3)] if i % 5 == 0 else [("M", L)]
        rows.append(B.BamRecord(
            name=f"r{i}", flag=16 if i % 2 else 0, ref_id=0, pos=int(p),
            mapq=int(rng.integers(0, 60)), cigar=cig,
            seq_nt16=np.array([idx16["ACGT"[c]] for c in seq], np.uint8),
            qual=rng.integers(1, 40, L).astype(np.uint8), tags={}))
    bam = tmp_path / "t.bam"
    B.write_bam(str(bam), [("tig1", ref_len)], rows)
    B.build_bai(str(bam))
    index = B.read_bai(str(bam) + ".bai")
    refs_n, recs_n = B.read_bam_region(str(bam), "tig1", 1000, 4000,
                                       index=index)
    orig = B._read_bam_region_via_native
    B._read_bam_region_via_native = lambda *a: None
    try:
        refs_p, recs_p = B.read_bam_region(str(bam), "tig1", 1000, 4000,
                                           index=index)
    finally:
        B._read_bam_region_via_native = orig
    assert refs_n == refs_p and len(recs_n) == len(recs_p) > 0
    for a, b in zip(recs_n, recs_p):
        assert (a.name, a.flag, a.pos, a.mapq, a.cigar) == \
            (b.name, b.flag, b.pos, b.mapq, b.cigar)
        np.testing.assert_array_equal(a.seq_nt16, b.seq_nt16)
        np.testing.assert_array_equal(a.qual, b.qual)
