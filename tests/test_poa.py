"""POA: oracle self-consistency + JAX DP/traceback parity vs the oracle."""

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import poa as P
from genomicsbench_palisade_tpu.ops.oracle import poa as PO


def _noisy_batches(rng, n_windows=4, sub=0.08, indel=0.04):
    batches, truths = [], []
    for _ in range(n_windows):
        truth = "".join(rng.choice(list("ACGT"), int(rng.integers(30, 70))))
        seqs = []
        for _ in range(int(rng.integers(3, 8))):
            r = []
            for ch in truth:
                u = rng.random()
                if u < indel:
                    continue
                r.append(ch if u > sub + indel else rng.choice(list("ACGT")))
                if u > 1 - indel:
                    r.append(rng.choice(list("ACGT")))
            seqs.append("".join(r))
        batches.append(seqs)
        truths.append(truth)
    return batches, truths


def test_oracle_identical_and_noisy():
    s = "ACGTACGTTGCAACGT"
    assert PO.msa_consensus([s] * 5) == s
    rng = np.random.default_rng(0)
    batches, truths = _noisy_batches(rng, 3, sub=0.05, indel=0.03)
    for seqs, truth in zip(batches, truths):
        cons = PO.msa_consensus(seqs)
        # consensus should essentially recover the truth at this noise level
        # (exact recovery is not guaranteed for every window)
        assert _edit_distance(cons, truth) <= max(3, 0.1 * len(truth)), (cons, truth)


def _edit_distance(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_jax_alignment_matches_oracle():
    rng = np.random.default_rng(1)
    batches, _ = _noisy_batches(rng, 5)
    graphs = [PO.PoaGraph() for _ in batches]
    maxr = max(len(b) for b in batches)
    for k in range(maxr):
        idxs = [i for i, b in enumerate(batches) if k < len(b)]
        alns = P.align_batch([graphs[i] for i in idxs], [batches[i][k] for i in idxs])
        for i, aln in zip(idxs, alns):
            want = PO.convex_nw_align(batches[i][k], graphs[i])
            assert aln == want, (i, k)
            graphs[i].add_alignment(want, batches[i][k])


def test_jax_alignment_long_gaps():
    """Multi-base deletion/insertion bursts force the traceback's
    extend-left / extend-up repair loops through multiple iterations."""
    rng = np.random.default_rng(7)
    truth = "".join(rng.choice(list("ACGT"), 80))
    seqs = [truth]
    for dele, ins in ((slice(20, 32), ""), (slice(50, 50), "GGTTAACCGGTT"),
                      (slice(5, 9), "AC"), (slice(60, 75), "T")):
        s = truth[: dele.start] + ins + truth[dele.stop:]
        seqs.append(s)
    g = PO.PoaGraph()
    for s in seqs:
        aln_d = P.align_batch([g], [s])[0]
        want = PO.convex_nw_align(s, g)
        assert aln_d == want
        g.add_alignment(want, s)


def test_jax_consensus_end_to_end():
    rng = np.random.default_rng(2)
    batches, _ = _noisy_batches(rng, 4)
    got = P.msa_consensus_batch(batches)
    want = [PO.msa_consensus(b) for b in batches]
    assert got == want


def test_native_graph_full_run_matches_python():
    """NativePoaGraph vs oracle PoaGraph over whole consensus runs: same
    alignments fed in, identical node counts, ranks, and consensus."""
    import pytest

    from genomicsbench_palisade_tpu.io.native import available

    if not available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(11)
    batches, _ = _noisy_batches(rng, 4, sub=0.1, indel=0.06)
    got = P.msa_consensus_batch(batches, use_native=True)
    want = P.msa_consensus_batch(batches, use_native=False)
    assert got == want
    # step-level: alignments against a shared evolving graph
    gn = P.NativePoaGraph()
    gp = PO.PoaGraph()
    for s in batches[0]:
        a_n = P.align_batch([gn], [s])[0]
        a_p = P.align_batch([gp], [s])[0]
        assert a_n == a_p
        gn.add_alignment(a_n, s)
        gp.add_alignment(a_p, s)
        assert gn.n_nodes() == len(gp.nodes)
    assert gn.generate_consensus() == gp.generate_consensus()
