"""Batched streaming k-mer counter vs the one-shot device pipeline.

count_kmers_batched (ops/kmer.py) exists for the reference's GB-scale
read sets (kmer-cnt minLen>=5000 regime): reads stream through the
device in chunks against a resident (key, count) accumulator.  Its
metrics must equal count_kmers exactly — including across batch
boundaries (the same kmer seen in several chunks must merge, not
double-count) and in the saturation tail.
"""

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import kmer as K


def _genome_reads(rng, genome_len=20_000, n_reads=60, read_len=5_500):
    """Coverage-style reads off one genome: cross-batch repeat pressure
    plus counts past the saturation threshold."""
    genome = rng.integers(0, 4, genome_len).astype(np.uint8)
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, genome_len - read_len))
        r = genome[s : s + read_len].copy()
        mut = rng.random(read_len) < 0.002
        r[mut] = rng.integers(0, 4, int(mut.sum()))
        reads.append(r)
    return reads


def test_batched_matches_oneshot_strings():
    rng = np.random.default_rng(3)
    reads = ["".join(rng.choice(list("ACGTN"),
                                int(rng.integers(5_100, 7_000))))
             for _ in range(30)]
    want = K.count_kmers(reads)
    got = K.count_kmers_batched(reads, batch_bases=50_000, cap=1 << 18)
    assert got == want


def test_batched_matches_oneshot_coverage_codes():
    rng = np.random.default_rng(11)
    reads = _genome_reads(rng)
    want = K.count_kmers(reads)
    assert want["hash_size"] > 0  # saturation tail exercised
    got = K.count_kmers_batched(reads, batch_bases=40_000, cap=1 << 18)
    assert got == want


def test_batched_min_length_filter_and_empty():
    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGT"), 1000)) for _ in range(5)]
    assert K.count_kmers_batched(reads) == {
        "total_kmers": 0, "hash_size": 0, "occurrences": 0}


def test_batched_cap_overflow_raises():
    rng = np.random.default_rng(7)
    reads = ["".join(rng.choice(list("ACGT"), 6_000)) for _ in range(4)]
    with pytest.raises(RuntimeError, match="cap"):
        K.count_kmers_batched(reads, batch_bases=10_000, cap=1 << 10)


def test_host_engine_matches_device():
    from genomicsbench_palisade_tpu.io.native import available

    if not available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(13)
    reads = _genome_reads(rng)
    want = K.count_kmers(reads)
    assert want["hash_size"] > 0
    got = K.count_kmers_host(reads)
    assert got == want


def test_engines_agree_on_offcontract_codes():
    """Code arrays holding raw code 4 (N not pre-mapped to 3): every
    engine must apply the reference's N->3 quirk itself, not rely on
    the caller contract."""
    from genomicsbench_palisade_tpu.io.native import available

    rng = np.random.default_rng(23)
    reads = [rng.integers(0, 5, int(rng.integers(5_100, 6_000)))
             .astype(np.int8) for _ in range(8)]
    mapped = [np.where(r >= 4, 3, r) for r in reads]
    want = K.count_kmers(mapped)
    assert K.count_kmers(reads) == want
    assert K.count_kmers_batched(reads, batch_bases=15_000,
                                 cap=1 << 18) == want
    if available():
        assert K.count_kmers_host(reads) == want


def test_batched_occurrence_bound_guard(monkeypatch):
    """The int32 run-prefix cumsum guard trips BEFORE the merge that
    would cross 2^31 accumulated occurrences (bound shrunk so the
    accounting is exercised without GB inputs)."""
    rng = np.random.default_rng(29)
    reads = ["".join(rng.choice(list("ACGT"), 6_000)) for _ in range(3)]
    import genomicsbench_palisade_tpu.ops.kmer as km

    monkeypatch.setattr(km, "_OCC_CUMSUM_BOUND", 10_000)
    with pytest.raises(RuntimeError, match="2\\^31|cumsum"):
        km.count_kmers_batched(reads, cap=1 << 18)


def test_host_engine_strings_with_n():
    from genomicsbench_palisade_tpu.io.native import available

    if not available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(17)
    reads = ["".join(rng.choice(list("ACGTN"),
                                int(rng.integers(5_100, 6_500))))
             for _ in range(16)]
    assert K.count_kmers_host(reads) == K.count_kmers(reads)
