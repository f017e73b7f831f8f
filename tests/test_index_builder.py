"""FM-index builder: SA-IS + vectorized assembly vs the oracle builder."""

import numpy as np
import pytest

from genomicsbench_palisade_tpu.index import builder as IB
from genomicsbench_palisade_tpu.index import fmi_index as FI
from genomicsbench_palisade_tpu.io import native
from genomicsbench_palisade_tpu.ops.oracle import fmi as FO


def _rand_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


@pytest.mark.parametrize("n", [13, 64, 65, 257, 1000])
def test_build_arrays_matches_oracle(n):
    rng = np.random.default_rng(n)
    seq = _rand_seq(rng, n)
    want = FO.build_index(seq)
    codes = IB._CODE_TABLE[np.frombuffer(seq.encode(), np.uint8)]
    got = IB.build_arrays(codes)
    assert got.ref_seq_len == want.ref_seq_len
    assert got.sentinel_index == want.sentinel_index
    np.testing.assert_array_equal(got.count, want.count)
    np.testing.assert_array_equal(got.cp_count, want.cp_count)
    np.testing.assert_array_equal(
        got.one_hot_hi, (want.one_hot >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(
        got.one_hot_lo, (want.one_hot & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    # SA arrays reassemble the oracle's suffix array
    sa = got.sa_ms_byte.astype(np.int64) << 32 | got.sa_ls_word.astype(np.int64)
    np.testing.assert_array_equal(sa, want.sa)


def test_native_sais_agrees_with_doubling():
    if not native.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    np.testing.assert_array_equal(
        native.sais(codes), FO.suffix_array(codes.astype(np.int64)))


def test_bwt2bit64_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 300).astype(np.uint8)
    idx = IB.build_arrays(codes)
    path = tmp_path / "ref.bwt.2bit.64"
    IB.write_bwt2bit64(idx, str(path))
    back = FI.load_bwt2bit64(str(path), load_sa=True)
    assert back.ref_seq_len == idx.ref_seq_len
    assert back.sentinel_index == idx.sentinel_index
    np.testing.assert_array_equal(back.count, idx.count)
    np.testing.assert_array_equal(back.cp_count, idx.cp_count)
    np.testing.assert_array_equal(back.one_hot_hi, idx.one_hot_hi)
    np.testing.assert_array_equal(back.one_hot_lo, idx.one_hot_lo)
    np.testing.assert_array_equal(back.sa_ms_byte, idx.sa_ms_byte)
    np.testing.assert_array_equal(back.sa_ls_word, idx.sa_ls_word)


def test_bntseq_artifacts(tmp_path):
    """.ann/.amb/.pac match the bntseq formats and round-trip the codes."""
    fa = tmp_path / "ref.fa"
    fa.write_text(">c1 first contig\nACGTNNNACGTRAC\n>c2\nGGTTAA\n")
    prefix = str(tmp_path / "ref")
    IB.build_from_fasta(str(fa), prefix, bntseq=True)

    ann = (tmp_path / "ref.ann").read_text().splitlines()
    l_pac = 14 + 6
    assert ann[0] == f"{l_pac} 2 11"
    assert ann[1] == "0 c1 first contig"
    assert ann[2] == "0 14 2"  # holes: NNN run + R
    assert ann[3] == "0 c2"
    assert ann[4] == "14 6 0"

    amb = (tmp_path / "ref.amb").read_text().splitlines()
    assert amb[0] == f"{l_pac} 2 2"
    assert amb[1] == "4 3 N"
    assert amb[2] == "11 1 R"

    # .pac: 2-bit decode (base i at bits (~i&3)*2) reproduces pack_fasta
    codes, _, _ = IB.pack_fasta(str(fa))
    raw = np.frombuffer((tmp_path / "ref.pac").read_bytes(), np.uint8)
    assert raw[-1] == l_pac % 4
    body = raw[:-1] if l_pac % 4 else raw[:-2]
    i = np.arange(l_pac)
    dec = (body[i >> 2] >> ((3 - (i & 3)) << 1)) & 3
    np.testing.assert_array_equal(dec, codes)


def test_fmi_build_cli_and_search(tmp_path, capsys):
    """Build from FASTA via the CLI, then run SMEM search on the artifact."""
    rng = np.random.default_rng(2)
    genome = _rand_seq(rng, 1500)
    fa = tmp_path / "ref.fa"
    # two contigs + lowercase + an ambiguous base
    fa.write_text(f">c1\n{genome[:800]}\n>c2\n{genome[800:].lower()}NACGT\n")
    from genomicsbench_palisade_tpu.cli.fmi_build import main

    rc = main([str(fa), "-p", str(tmp_path / "idx"), "--bwt2bit"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "* ref_seq_len: " in out and "* sentinel_index: " in out
    didx = FI.load_npz(str(tmp_path / "idx.npz"))
    assert didx.ref_seq_len == 2 * (1500 + 5) + 1
    assert didx.sa_ls_word is not None

    # SMEM parity: oracle search over the same text must agree with an
    # oracle index built directly (the builder's pac must be identical)
    codes, _names, _lens = IB.pack_fasta(str(fa))
    seq_str = "ACGT"
    text = "".join(seq_str[c] for c in codes)
    want = FO.build_index(text)
    np.testing.assert_array_equal(didx.cp_count, want.cp_count)
    read = text[200:280]
    smems = FO.get_smems_all_pos(want, np.array(
        [FO._CODE[c] for c in read], np.int64), min_intv=1, min_seed_len=19)
    assert len(smems) >= 1


def test_sa_entry_lookup_direct_and_compressed():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 777).astype(np.uint8)
    full = np.concatenate([codes, (3 - codes[::-1]).astype(np.uint8)])
    want_idx = IB.build_arrays(codes)
    # ground-truth SA from the oracle
    oracle_sa = np.empty(want_idx.ref_seq_len, np.int64)
    oracle_sa[0] = len(full)
    oracle_sa[1:] = FO.suffix_array(full.astype(np.int64))

    comp_idx = IB.build_arrays(codes, sa_compression=True)
    assert len(comp_idx.sa_ls_word) == (want_idx.ref_seq_len >> 3) + 1
    for pos in list(range(0, 40)) + [100, 555, want_idx.ref_seq_len - 1,
                                     want_idx.sentinel_index]:
        want = int(oracle_sa[pos])
        assert FI.get_sa_entry(want_idx, pos) == want, ("direct", pos)
        assert FI.get_sa_entry(comp_idx, pos) == want, ("compressed", pos)
    np.testing.assert_array_equal(
        FI.get_sa_entries(want_idx, np.arange(want_idx.ref_seq_len)), oracle_sa)


def test_sa_entries_smems_locates_read():
    """An exact read's SMEM coordinates must include its true position."""
    rng = np.random.default_rng(4)
    seq = _rand_seq(rng, 2000)
    codes = IB._CODE_TABLE[np.frombuffer(seq.encode(), np.uint8)]
    didx = IB.build_arrays(codes)
    oidx = FO.build_index(seq)
    read = seq[700:780]
    smems = FO.get_smems_all_pos(
        oidx, np.array([FO._CODE[c] for c in read], np.int64),
        min_intv=1, min_seed_len=19)
    ks = [m["k"] for m in smems]
    ss = [m["s"] for m in smems]
    coords, counts = FI.get_sa_entries_smems(didx, ks, ss, max_occ=16)
    assert counts.sum() == len(coords)
    assert 700 in coords.tolist()
