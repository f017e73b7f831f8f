"""Oracle parity vs golden fixtures generated from the reference binaries.

Fixtures were produced by tools/golden/{gkl,bsw,chain}_golden — standalone
builds of the reference's own kernels (GKL AVX pairhmm, bwa-mem2
scalarBandedSWA, minimap2-acceleration scalar chain_dp).
"""

import json

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops.oracle import bsw as bsw_o
from genomicsbench_palisade_tpu.ops.oracle import chain as chain_o
from genomicsbench_palisade_tpu.ops.oracle import fmi as fmi_o
from genomicsbench_palisade_tpu.ops.oracle import kmer as kmer_o
from genomicsbench_palisade_tpu.ops.oracle import phmm as phmm_o


def test_phmm_oracle_golden_single():
    """GKL unit-test contract: ACGT/ACGT all-'+' quals -> -6.022797e-01."""
    rs = phmm_o.encode_bases("ACGT")
    q = np.full(4, ord("+"))
    got = phmm_o.compute_likelihood(rs, rs, q, q, q, q)
    assert abs(got - (-6.022797e-01)) < 1e-5


def test_phmm_oracle_vs_reference(fixtures_dir):
    cases = json.load(open(fixtures_dir / "phmm_golden.json"))
    for case in cases:
        rs = phmm_o.encode_bases(case["rs"])
        hap = phmm_o.encode_bases(case["hap"])
        quals = [
            np.array([ord(ch) for ch in case[k]], dtype=np.int32)
            for k in ("q", "i", "d", "c")
        ]
        got = phmm_o.compute_likelihood(rs, hap, *quals)
        # GKL's own tolerance contract (PairHmmUnitTest.java:55)
        assert abs(got - case["log10"]) < 1e-5, case


def test_bsw_oracle_vs_reference(fixtures_dir):
    cases = json.load(open(fixtures_dir / "bsw_golden.json"))
    for case in cases:
        got = bsw_o.scalar_banded_swa(case["query"], case["target"], case["h0"])
        assert got == case["out"], case


def test_chain_oracle_vs_reference(fixtures_dir):
    calls = json.load(open(fixtures_dir / "chain_golden.json"))
    for call in calls:
        cc = chain_o.ChainCall(
            n=call["n"],
            avg_qspan=call["avg_qspan"],
            max_dist_x=call["max_dist_x"],
            max_dist_y=call["max_dist_y"],
            bw=call["bw"],
            n_segs=call["n_segs"],
            x=np.array([int(v) for v in call["x"]], dtype=np.uint64),
            y=np.array([int(v) for v in call["y"]], dtype=np.uint64),
        )
        res = chain_o.chain_dp(cc)
        np.testing.assert_array_equal(res["scores"], call["scores"])
        np.testing.assert_array_equal(res["parents"], call["parents"])


# ---------------------------------------------------------------------------
# FM-index oracle: first-principles invariants on tiny references
# ---------------------------------------------------------------------------


def _count_occurrences(text: str, pattern: str) -> int:
    n = 0
    start = 0
    while True:
        i = text.find(pattern, start)
        if i < 0:
            return n
        n += 1
        start = i + 1


@pytest.fixture(scope="module")
def tiny_index():
    rng = np.random.default_rng(5)
    fwd = "".join(rng.choice(list("ACGT"), 400))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    text = fwd + "".join(comp[c] for c in reversed(fwd))
    return fmi_o.build_index(fwd), fwd, text


def test_fmi_backward_ext_counts(tiny_index):
    """(k, s) of a backward-extended interval == brute-force pattern count."""
    idx, fwd, text = tiny_index
    rng = np.random.default_rng(11)
    for _ in range(50):
        plen = int(rng.integers(1, 12))
        start = int(rng.integers(0, len(fwd) - plen))
        pattern = fwd[start : start + plen]
        codes = [fmi_o._CODE[c] for c in pattern]
        # backward search: start from last char interval, extend leftward
        a = codes[-1]
        smem = {
            "rid": 0,
            "m": 0,
            "n": 0,
            "k": int(idx.count[a]),
            "l": int(idx.count[3 - a]),
            "s": int(idx.count[a + 1] - idx.count[a]),
        }
        for a in reversed(codes[:-1]):
            smem = fmi_o.backward_ext(idx, smem, a)
        assert smem["s"] == _count_occurrences(text, pattern), pattern
        # SA rows k..k+s must point at actual occurrences
        for row in range(smem["k"], smem["k"] + smem["s"]):
            pos = int(idx.sa[row])
            assert text[pos : pos + plen] == pattern


def test_fmi_smem_maximality(tiny_index):
    """Reported SMEMs occur s times and cannot be extended within min_intv."""
    idx, fwd, text = tiny_index
    rng = np.random.default_rng(3)
    read = "".join(rng.choice(list("ACGT"), 40))
    enc = fmi_o.encode_read(read)
    smems = fmi_o.get_smems_all_pos(idx, enc, 1, 5)
    for sm in smems:
        sub = read[sm["m"] : sm["n"] + 1]
        assert sm["n"] - sm["m"] + 1 >= 5
        assert sm["s"] == _count_occurrences(text, sub), sub
    # a read copied verbatim from the reference must yield a full-length SMEM
    start = 100
    read = fwd[start : start + 30]
    smems = fmi_o.get_smems_all_pos(idx, fmi_o.encode_read(read), 1, 19)
    full = [s for s in smems if s["m"] == 0 and s["n"] == 29]
    assert full, smems
    assert full[0]["s"] == _count_occurrences(text, read)


def test_fmi_pipeline_runs(tiny_index):
    idx, fwd, text = tiny_index
    reads = [fwd[10:110], fwd[50:201], "ACGTN" + fwd[300:395]]
    enc = [fmi_o.encode_read(r) for r in reads]
    smems, n1, n2, n3 = fmi_o.fmi_pipeline(idx, enc)
    assert n1 + n2 + n3 == len(smems)
    assert n1 > 0
    # sort contract: rid asc, m asc, n desc
    keys = [(s["rid"], s["m"], -s["n"]) for s in smems]
    assert keys == sorted(keys)


def test_kmer_oracle_tiny():
    # k=3, short min length for the test
    reads = ["ACGTACGT" * 2, "TTTTTTTTTT"]
    res = kmer_o.count_kmers(reads, k=3, min_read_length=5)
    # read1: 16 bases -> kmers at positions 0..12 (last excluded)
    # ACG,CGT,GTA,TAC repeating; canonical: ACG<->CGT(rc=ACG)...
    # read2: TTT x7 (positions 0..6), canonical AAA
    counter = res["counter"]
    total_occurrences = sum(counter.values())
    assert total_occurrences == 13 + 7
    assert res["total_kmers"] == len(counter)
    # AAA (canonical of TTT) must be present
    assert counter[0] == 7


def test_kmer_canonical_involution():
    rng = np.random.default_rng(1)
    for _ in range(20):
        code = int(rng.integers(0, 4**7))
        rc = kmer_o.revcomp_code(code, 7)
        assert kmer_o.revcomp_code(rc, 7) == code
