"""k-mer counting: device sort-reduce vs the counting oracle."""

import numpy as np

from genomicsbench_palisade_tpu.ops import kmer as K
from genomicsbench_palisade_tpu.ops.oracle import kmer as KO


def _random_reads(rng, n, lo, hi):
    return [
        "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))) for _ in range(n)
    ]


def test_kmer_pack_matches_oracle():
    rng = np.random.default_rng(2)
    reads = _random_reads(rng, 4, 30, 60)
    k = 17
    bases, lengths = K.encode_reads_np(reads)
    hi, lo, valid = K.pack_kmers(np.asarray(bases, np.int32), lengths, k)
    hi, lo, valid = map(np.asarray, (hi, lo, valid))
    for i, r in enumerate(reads):
        codes = KO.kmer_codes(KO.encode_seq(r), k)
        assert valid[i].sum() == len(codes)
        got = (hi[i].astype(np.uint64) << np.uint64(32)) | lo[i].astype(np.uint64)
        np.testing.assert_array_equal(got[: len(codes)], codes)


def test_kmer_canonical_matches_oracle():
    rng = np.random.default_rng(3)
    reads = _random_reads(rng, 3, 25, 50)
    k = 17
    bases, lengths = K.encode_reads_np(reads)
    hi, lo, valid = K.pack_kmers(np.asarray(bases, np.int32), lengths, k)
    chi, clo = K.canonical(hi, lo, k)
    chi, clo, valid = map(np.asarray, (chi, clo, valid))
    for i, r in enumerate(reads):
        codes = KO.canonical_codes(KO.kmer_codes(KO.encode_seq(r), k), k)
        got = (chi[i].astype(np.uint64) << np.uint64(32)) | clo[i].astype(np.uint64)
        np.testing.assert_array_equal(got[: len(codes)], codes)


def test_kmer_counts_match_oracle():
    rng = np.random.default_rng(4)
    # repetitive reads so some k-mers exceed the 4-bit saturation
    unit = "".join(rng.choice(list("ACGT"), 40))
    reads = [unit * 20, unit * 8 + "ACGTACGTACGTACGTACGTA"] + _random_reads(
        rng, 5, 100, 300
    )
    for k in (17, 11):
        want = KO.count_kmers(reads, k=k, min_read_length=50)
        got = K.count_kmers(reads, k=k, min_read_length=50)
        assert got["total_kmers"] == want["total_kmers"], k
        assert got["hash_size"] == want["hash_size"], k
        assert got["occurrences"] == sum(want["counter"].values()), k


def test_kmer_min_length_filter():
    reads = ["ACGT" * 100, "ACGT" * 3]
    got = K.count_kmers(reads, k=5, min_read_length=100)
    want = KO.count_kmers([reads[0]], k=5, min_read_length=100)
    assert got["total_kmers"] == want["total_kmers"]
