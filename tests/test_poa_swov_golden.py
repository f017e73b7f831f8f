"""Reference-binary golden parity for spoa's kSW / kOV alignment types.

The benchmark driver hardcodes kNW (msa_spoa_omp.cpp:264); kSW and kOV
are the spoa library's remaining AlignmentType capability surface
(alignment_engine.hpp:19-24).  Fixtures in fixtures/poa_swov_golden.json
come from the reference's own spoa library (tools/golden/poa_harness.cpp
with the [sw|ov] argument) and pin EXACT per-sequence alignments — the
(node_id, seq_pos) pair lists with -1 gaps — plus the consensus grown
from them, against ops/oracle/poa.convex_align.
"""

import json
import pathlib

import pytest

from genomicsbench_palisade_tpu.ops.oracle import poa as PO

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "poa_swov_golden.json") as f:
        return json.load(f)["cases"]


@pytest.mark.parametrize("align_type", ["sw", "ov"])
def test_swov_alignments_match_reference(golden, align_type):
    for ci, case in enumerate(golden):
        graph = PO.PoaGraph()
        want = case[align_type]
        for si, seq in enumerate(case["seqs"]):
            aln = PO.convex_align(seq, graph, align_type=align_type)
            assert [list(pr) for pr in aln] == want["alignments"][si], (
                f"case {ci} seq {si} {align_type} alignment mismatch")
            graph.add_alignment(aln, seq)
        assert graph.generate_consensus() == want["consensus"], (
            f"case {ci} {align_type} consensus mismatch")


@pytest.mark.parametrize("align_type", ["sw", "ov"])
def test_swov_device_matches_reference(golden, align_type):
    """The DEVICE engine (ops/poa.py poa_align_device, generalized to all
    three AlignmentTypes) must reproduce the reference binary's exact
    sw/ov alignments and the consensus grown from them.  Graphs grow in
    lock-step across cases, one device round per sequence index (the
    production batching shape)."""
    from genomicsbench_palisade_tpu.ops import poa as P

    graphs = [PO.PoaGraph() for _ in golden]
    max_rounds = max(len(c["seqs"]) for c in golden)
    for k in range(max_rounds):
        idxs = [ci for ci, c in enumerate(golden) if k < len(c["seqs"])]
        alns = P.align_batch([graphs[ci] for ci in idxs],
                             [golden[ci]["seqs"][k] for ci in idxs],
                             align_type=align_type)
        for ci, aln in zip(idxs, alns):
            want = golden[ci][align_type]["alignments"][k]
            assert [list(pr) for pr in aln] == want, (
                f"case {ci} seq {k} {align_type} device alignment mismatch")
            graphs[ci].add_alignment(aln, golden[ci]["seqs"][k])
    for ci, case in enumerate(golden):
        assert (graphs[ci].generate_consensus()
                == case[align_type]["consensus"]), (
            f"case {ci} {align_type} device consensus mismatch")


def test_nw_alias_unchanged():
    """convex_nw_align must stay the kNW specialisation of convex_align
    (the production device/golden paths route through it)."""
    rng_seqs = ["ACGTACGTAC", "ACGTACGTTC"]
    g1, g2 = PO.PoaGraph(), PO.PoaGraph()
    for s in rng_seqs:
        a1 = PO.convex_nw_align(s, g1)
        a2 = PO.convex_align(s, g2, align_type="nw")
        assert a1 == a2
        g1.add_alignment(a1, s)
        g2.add_alignment(a2, s)
    assert g1.generate_consensus() == g2.generate_consensus()
