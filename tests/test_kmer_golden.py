"""Reference-binary golden parity for the Flye k-mer counter.

Fixtures in fixtures/kmer_golden.json come from the reference's own
KmerCounter (benchmarks/kmer-cnt/vertex_index.cpp built with the
plaintext HE stub — tools/golden/kmer_harness.cpp).  Asserts totals and
the full per-kmer frequency map against both the oracle and the device
sort-reduce engine.
"""

import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import kmer as K
from genomicsbench_palisade_tpu.ops.oracle import kmer as KO

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "kmer_golden.json") as f:
        return json.load(f)["cases"]


def test_kmer_oracle_matches_reference(golden):
    for case in golden:
        want = {int(k): v for k, v in case["freqs"].items()}
        # freq-0 entries are k-mers present in the reads but never counted
        # (the reference's IterKmers skips each read's final k-mer): assert
        # we don't count them either
        zeros = {k for k, v in want.items() if v == 0}
        want = {k: v for k, v in want.items() if v > 0}
        got = KO.count_kmers(case["reads"], k=case["k"],
                             min_read_length=case["min_read_length"])
        assert got["total_kmers"] == case["total_kmers"]
        assert got["hash_size"] == case["hash_size"]
        assert dict(got["counter"]) == want, "per-kmer frequency mismatch"
        assert not (zeros & set(got["counter"])), "counted a skipped k-mer"


def test_kmer_device_matches_reference(golden):
    for case in golden:
        got = K.count_kmers(case["reads"], k=case["k"],
                            min_read_length=case["min_read_length"])
        assert int(got["total_kmers"]) == case["total_kmers"]
        assert int(got["hash_size"]) == case["hash_size"]
