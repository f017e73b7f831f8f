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


def test_minimizer_selection_properties():
    """yieldMinimizers invariants: every window of w k-mers contains a
    selected position; density ~2/(w+1); emission order is by position."""
    import numpy as np
    from genomicsbench_palisade_tpu.ops.oracle.kmer import (
        encode_seq, kmer_codes, yield_minimizers)

    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 500))
    codes = encode_seq(seq)
    w, k = 5, 17
    mins = yield_minimizers(codes, k, w)
    pos = [p for p, _ in mins]
    assert pos == sorted(set(pos))
    n_kmers = len(kmer_codes(codes, k))
    # coverage: every full window beyond the ramp has a minimizer
    ps = set(pos)
    for start in range(n_kmers - w + 1):
        assert any(start <= p < start + w for p in ps), start
    # forward codes are the true k-mer codes at those positions
    allc = kmer_codes(codes, k)
    for p, c in mins:
        assert int(allc[p]) == c


def test_minimizer_window1_is_all_kmers():
    from genomicsbench_palisade_tpu.ops.oracle.kmer import (
        encode_seq, kmer_codes, yield_minimizers)

    seq = "ACGTACGTACGTACGTACGTACGTA"
    codes = encode_seq(seq)
    mins = yield_minimizers(codes, 17, 1)
    assert len(mins) == len(kmer_codes(codes, 17))


def test_kmer_cnt_cli_minimizers(tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(5)
    fa = tmp_path / "r.fa"
    fa.write_text(f">r0\n{''.join(rng.choice(list('ACGT'), 6000))}\n")
    cfg = tmp_path / "c.cfg"
    cfg.write_text("kmer_size = 17\nuse_minimizers = 1\nminimizer_window = 5\n"
                   "repeat_kmer_rate = 1.5\n")
    from genomicsbench_palisade_tpu.cli.kmer_cnt import main

    rc = main(["--reads", str(fa), "--config", str(cfg), "--debug"])
    assert rc == 0
    out = capsys.readouterr()
    assert "useMinimizers: 1" in out.out
    assert "Selected k-mers: " in out.err
    assert "Index size: " in out.err
    assert "Kernel time:" in out.err


def test_minimizer_index_production_matches_oracle():
    """ops.kmer.build_minimizer_index (native path when built) == oracle."""
    import numpy as np

    from genomicsbench_palisade_tpu.ops.kmer import (
        build_minimizer_index as prod)
    from genomicsbench_palisade_tpu.ops.oracle.kmer import (
        build_minimizer_index as spec)

    rng = np.random.default_rng(3)
    reads = []
    for _ in range(6):
        n = int(rng.integers(60, 500))
        seq = rng.integers(0, 4, n)
        if rng.random() < 0.5:  # homopolymer runs stress equal-hash ties
            s = int(rng.integers(0, n - 20))
            seq[s : s + 15] = seq[s]
        reads.append("".join("ACGT"[c] for c in seq))
    for k, w in ((15, 5), (17, 1), (7, 8)):
        got = prod(reads, k=k, window=w, min_read_length=50)
        want = spec(reads, k=k, window=w, min_read_length=50)
        assert got == want, (k, w)
