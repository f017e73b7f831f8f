"""Reference-binary golden parity for spoa partial-order alignment.

Fixtures in fixtures/poa_golden.json come from the reference's own spoa
library (tools/spoa sisd engine + graph, built with the plaintext HE
stub — tools/golden/poa_harness.cpp) run through the poa driver's batch
flow with its scores (kNW convex m=2 x=-4 o1=-4 e1=-2 o2=-24 e2=-1).
Asserts identical consensus strings from our oracle graph and from the
device alignment + native graph path.
"""

import json
import pathlib

import pytest

from genomicsbench_palisade_tpu.ops import poa as P
from genomicsbench_palisade_tpu.ops.oracle import poa as PO

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "poa_golden.json") as f:
        return json.load(f)["cases"]


def test_poa_oracle_matches_reference(golden):
    for case in golden:
        for seqs, want in zip(case["batches"], case["consensus"]):
            got = PO.msa_consensus(seqs)
            assert got == want, f"oracle consensus mismatch on {seqs}"


def test_poa_device_matches_reference(golden):
    batches = [seqs for case in golden for seqs in case["batches"]]
    wants = [w for case in golden for w in case["consensus"]]
    outs = P.msa_consensus_batch(batches)
    for got, want, seqs in zip(outs, wants, batches):
        assert got == want, f"device consensus mismatch on {seqs}"
