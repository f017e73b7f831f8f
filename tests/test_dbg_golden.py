"""Reference-binary golden parity for the Platypus de Bruijn assembler.

Fixtures in fixtures/dbg_golden.json come from the reference's own graph
build (benchmarks/dbg/debruijn.cpp compiled via tools/golden/
dbg_harness.cpp).  Asserts the full colored graph — node colours/
positions/weights, every edge weight — and the cycle-detection verdict.
"""

import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import dbg as DG

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "dbg_golden.json") as f:
        return json.load(f)["cases"]


def test_dbg_graph_matches_reference(golden):
    for case in golden:
        g = DG.DeBruijnGraph(case["kmer_size"])
        g.load_reference(case["ref"], case["ref_start"])
        for r in case["reads"]:
            g.load_read(r["seq"], np.array(r["quals"], np.uint8),
                        case["min_qual"])
        ours_nodes = {k: [n.colours, n.position, float(n.weight)]
                      for k, n in g.nodes.items()}
        assert ours_nodes == case["nodes"], "node set/attrs mismatch"
        ours_edges = {f"{k}>{k2}": float(w)
                      for k, n in g.nodes.items()
                      for k2, w in n.edges.items()}
        assert ours_edges == case["edges"], "edge weights mismatch"
        min_weight = 2 * case["min_qual"]  # minReads * minQual
        assert int(g.detect_cycles(min_weight)) == case["cycles"]


def _build_graph(case):
    g = DG.DeBruijnGraph(case["kmer_size"])
    g.load_reference(case["ref"], case["ref_start"])
    for r in case["reads"]:
        g.load_read(r["seq"], np.array(r["quals"], np.uint8),
                    case["min_qual"])
    return g


def test_dbg_variant_paths_match_reference(golden):
    """Per-seed bubble paths vs the reference's OWN
    getVariantPathsThroughGraphFromNode (debruijn.cpp:1147-1230),
    executed in tools/golden/dbg_harness.cpp: same seed set (the
    function's extension filter :1217 applied to every REF_AND_READ
    node's edges), same finished paths in the same order, same
    explosion (NULL) verdicts."""
    assert any(c["seeds"] for c in golden), "no seeds in fixtures"
    for case in golden:
        g = _build_graph(case)
        min_weight = 2 * case["min_qual"]
        # our qualifying seed set must equal the harness's
        ours_seeds = set()
        for k, n in g.nodes.items():
            if n.colours != DG.REF_AND_READ:
                continue
            for succ, w in n.edges.items():
                nxt = g.nodes[succ]
                if w >= min_weight or nxt.colours in (DG.REF_AND_READ,
                                                      DG.REF):
                    ours_seeds.add((k, succ))
        want_seeds = {(s["start"], s["succ"]) for s in case["seeds"]}
        assert ours_seeds == want_seeds, "seed set mismatch"
        for s in case["seeds"]:
            got = g.variant_paths_from_seed([s["start"], s["succ"]],
                                            min_weight)
            if s["exploded"]:
                assert got is None, (s["start"], s["succ"], "not exploded")
            else:
                assert got == s["paths"], (s["start"], s["succ"])
