"""Reference-binary golden parity for medaka pileup counting.

Fixtures in fixtures/pileup_golden.json were produced by the reference's
own medaka_counts.c + htslib (built with -DPRINT_OUTPUT; see
tests/generate_fixtures.py gen_pileup).  The BAMs are synthesized by our
io/bam.py writer — htslib decoding them is itself a cross-validation of
the writer.  Asserts major/minor coordinates and the full
featlen×num_homop count matrix per column.
"""

import json
import pathlib
import sys

import numpy as np
import pytest

from genomicsbench_palisade_tpu.io import bam as B
from genomicsbench_palisade_tpu.ops import pileup as P

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "pileup_golden.json") as f:
        return json.load(f)["cases"]


def _records(case):
    idx16 = {c: i for i, c in enumerate(B.SEQ_NT16_STR)}
    return [
        B.BamRecord(
            name=r["name"], flag=r["flag"], ref_id=0, pos=r["pos"],
            mapq=r["mapq"], cigar=[tuple(c) for c in r["cigar"]],
            seq_nt16=np.array([idx16[ch] for ch in r["seq"]], np.uint8),
            qual=np.array(r["qual"], np.uint8), tags={})
        for r in case["records"]
    ]


def test_pileup_matches_reference(golden):
    for case in golden:
        recs = _records(case)
        _, rng = case["region"].split(":")
        start, end = (int(x) for x in rng.split("-"))
        # hts_parse_reg: 1-based inclusive -> 0-based end-exclusive; the
        # driver then re-parses its 0-based chunk string as 1-based,
        # shifting the chunk start down one more (medaka_counts.c:545-555)
        res = P.calculate_pileup(recs, 0, max(start - 2, 0), end,
                                 num_homop=5)
        rows = case["rows"]
        assert res["n_cols"] == len(rows), "column count mismatch"
        mat, major, minor = res["matrix"], res["major"], res["minor"]
        for j, row in enumerate(rows):
            assert row[0] == major[j] and row[1] == minor[j], (
                f"coords mismatch at col {j}")
            assert row[2:-1] == list(mat[j]), f"counts mismatch at col {j}"
            assert row[-1] == int(np.sum(mat[j]))
