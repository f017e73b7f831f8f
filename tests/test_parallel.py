"""Multi-device (virtual 8-CPU mesh) sharded kernels vs single-device."""

import jax
import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import kmer as K
from genomicsbench_palisade_tpu.ops import phmm as P
from genomicsbench_palisade_tpu.ops.oracle import kmer as KO
from genomicsbench_palisade_tpu.parallel import dp, mesh as M


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual cpu devices"
    return M.make_mesh(8)


def test_phmm_sharded_matches_single(mesh8):
    rng = np.random.default_rng(0)
    reads, haps, pairs = [], [], []
    for k in range(16):
        rl, hl = int(rng.integers(5, 30)), int(rng.integers(5, 40))
        reads.append(
            {
                "bases": rng.integers(0, 4, rl),
                "q": rng.integers(33, 60, rl),
                "i": rng.integers(33, 60, rl),
                "d": rng.integers(33, 60, rl),
                "c": rng.integers(33, 60, rl),
            }
        )
        haps.append(rng.integers(0, 4, hl))
        pairs.append((k, k))
    batch = P.prepare_batch(reads, haps, pairs)
    want, _, _ = map(np.asarray, P.phmm_forward(batch))
    sharded, n = M.shard_batch(batch, mesh8)
    got, _, _ = map(np.asarray, dp.phmm_forward_sharded(mesh8, sharded))
    np.testing.assert_allclose(got[:n], want, rtol=0, atol=0)


def test_bsw_sharded_matches_single(mesh8):
    from genomicsbench_palisade_tpu.ops import bsw as W

    rng = np.random.default_rng(4)
    pairs = []
    for _ in range(16):
        ql, tl = int(rng.integers(5, 40)), int(rng.integers(5, 60))
        pairs.append((rng.integers(0, 5, ql), rng.integers(0, 5, tl),
                      int(rng.integers(1, 40))))
    batch = W.prepare_pairs(pairs, q_pad=64, t_pad=64)
    want = {k: np.asarray(v) for k, v in W.bsw_batch(batch).items()}
    sharded, n = M.shard_batch(batch, mesh8)
    got = {k: np.asarray(v)[:n]
           for k, v in dp.bsw_batch_sharded(mesh8, sharded).items()}
    for key in want:
        np.testing.assert_array_equal(got[key], want[key])


def test_fmi_sharded_index_search(mesh8):
    """FM-index sharded by block range over the mesh == single-device."""
    import jax.numpy as jnp

    from genomicsbench_palisade_tpu.index.builder import build_arrays
    from genomicsbench_palisade_tpu.ops import fmi as F

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 4000).astype(np.uint8)
    index = build_arrays(genome).as_device_arrays()
    b, l_max = 16, 24
    enc = np.zeros((b, l_max), np.int32)
    lengths = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(8, l_max + 1))
        s = int(rng.integers(0, len(genome) - n))
        enc[i, :n] = genome[s : s + n]
        lengths[i] = n
    if rng.random() < 2:  # one read with a mismatch (s hits 0 mid-walk)
        enc[0, 2] = (enc[0, 2] + 1) % 4

    # single-device reference: repeated backward_ext from the root
    count = np.asarray(index["count"])
    want_k = np.zeros(b, np.int64)
    want_l = np.zeros(b, np.int64)
    want_s = np.zeros(b, np.int64)
    for i in range(b):
        n = int(lengths[i])
        a = int(enc[i, n - 1])
        k, l, s = count[a], count[3 - a], count[a + 1] - count[a]
        for t in range(n - 2, -1, -1):
            if s <= 0:
                break
            k2, l2, s2 = F.backward_ext(
                index, jnp.asarray([k]), jnp.asarray([l]), jnp.asarray([s]),
                jnp.asarray([enc[i, t]]))
            k, l, s = int(k2[0]), int(l2[0]), int(s2[0])
        want_k[i], want_l[i], want_s[i] = k, l, s

    got_k, got_l, got_s = dp.fmi_backward_search_sharded(
        mesh8, index, enc, lengths)
    np.testing.assert_array_equal(np.asarray(got_k), want_k)
    np.testing.assert_array_equal(np.asarray(got_l), want_l)
    np.testing.assert_array_equal(np.asarray(got_s), want_s)
    assert (np.asarray(got_s)[1:] > 0).all()  # true substrings must match


def test_kmer_sharded_matches_oracle(mesh8):
    rng = np.random.default_rng(9)
    unit = "".join(rng.choice(list("ACGT"), 30))
    reads = [unit * 10 for _ in range(3)] + [
        "".join(rng.choice(list("ACGT"), 200)) for _ in range(13)
    ]
    k = 17
    want = KO.count_kmers(reads, k=k, min_read_length=10)
    bases, lengths = K.encode_reads_np(reads)
    got = dp.count_kmers_sharded(
        mesh8, np.asarray(bases, np.int32), lengths, k=k
    )
    assert int(got["total_kmers"]) == want["total_kmers"]
    assert int(got["hash_size"]) == want["hash_size"]
    assert int(got["occurrences"]) == sum(want["counter"].values())


def test_scaling_harness_runs(mesh8, capsys):
    """tools/scaling_bench emits well-formed JSON per device point."""
    import json
    import sys
    sys.path.insert(0, "tools")
    import scaling_bench

    rc = scaling_bench.main(["--kernel", "phmm", "--devices", "1,2",
                             "--batch", "16", "--iters", "1"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().split("\n") if l]
    recs = [json.loads(l) for l in lines]
    assert recs[0]["devices"] == 1 and recs[1]["devices"] == 2
    assert recs[0]["scaling_efficiency"] == 1.0
    assert recs[-1]["unit"] == "fraction_of_linear"


def test_host_local_slice_single_process():
    from genomicsbench_palisade_tpu.parallel.mesh import host_local_slice

    assert host_local_slice(10) == slice(0, 10)


def test_shard_work_imbalance():
    from genomicsbench_palisade_tpu.parallel.mesh import shard_work_imbalance

    assert shard_work_imbalance([1, 1, 1, 1], 4) == 1.0
    assert shard_work_imbalance([4, 1, 1, 1], 4) == pytest.approx(16 / 7)


def test_profiling_roi(tmp_path, monkeypatch):
    """roi() writes an xprof trace when enabled, no-ops when disabled."""
    import jax.numpy as jnp
    from genomicsbench_palisade_tpu.utils import profiling as prof

    monkeypatch.delenv(prof.ENV_VAR, raising=False)
    with prof.roi():  # disabled: pure no-op
        jnp.zeros(4).block_until_ready()
    with prof.roi(trace_dir=str(tmp_path), name="phmm"):
        with prof.annotate("sub"):
            jnp.ones(8).sum().block_until_ready()
    import os
    found = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "profiler trace files should be written"
    stats = prof.device_memory_stats()
    assert isinstance(stats, dict)


def test_grm_sharded_matches_single(mesh8):
    import numpy as np
    from genomicsbench_palisade_tpu.ops import grm as G
    from genomicsbench_palisade_tpu.parallel.dp import grm_sharded

    rng = np.random.default_rng(12)
    m, n = 64, 24
    geno = rng.choice([0, 1, 2, 3], size=(m, n), p=[.5, .3, .15, .05]).astype(np.int8)
    want_grm, want_cnt = G.compute_grm(geno, block=16)

    miss = geno == 3
    g64 = np.where(miss, 0.0, geno.astype(np.float64))
    freqs = g64.sum(1) / np.maximum(2.0 * (~miss).sum(1), 1.0)
    var = 2.0 * freqs * (1.0 - freqs)
    ok = var > G.K_SMALL_EPSILON
    isd = np.where(ok, 1.0 / np.sqrt(np.where(ok, var, 1.0)), 0.0)
    import jax.numpy as jnp

    sums, counts = grm_sharded(
        mesh8, jnp.asarray(geno), jnp.asarray((2 * freqs).astype(np.float32)),
        jnp.asarray(isd.astype(np.float32)), jnp.asarray(ok), block=8)
    got = np.asarray(sums) / np.maximum(np.asarray(counts), 1.0)
    np.testing.assert_allclose(got, want_grm, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(counts), want_cnt)


def test_chain_halo_sharded_matches_single(mesh8):
    """Anchor-axis sharding with ppermute halo == single-device chain DP."""
    import numpy as np
    from genomicsbench_palisade_tpu.ops import chain as C
    from genomicsbench_palisade_tpu.parallel.dp import chain_dp_halo_sharded

    rng = np.random.default_rng(21)
    n = 600  # not divisible by 8: exercises padding (per-shard 75 >= w=64)
    xs = np.cumsum(rng.integers(1, 40, n)).astype(np.int64) + 1000
    ys = np.maximum(xs + rng.integers(-300, 300, n), 0)
    call = C.prepare_call(xs, ys, avg_qspan=22.5)
    w = 64
    want = C.chain_call(call, w=w, n_pad=n)
    got = chain_dp_halo_sharded(mesh8, call, w=w)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(got[2], want[2])


def test_fmi_pipeline_index_sharded(mesh8):
    """Full 3-phase SMEM pipeline over a block-range-sharded index ==
    the unsharded engine, bit for bit."""
    import jax.numpy as jnp

    from genomicsbench_palisade_tpu.index.builder import build_arrays
    from genomicsbench_palisade_tpu.ops import fmi_pipeline as FP

    rng = np.random.default_rng(17)
    genome = rng.integers(0, 4, 6000).astype(np.uint8)
    index = build_arrays(genome).as_device_arrays()
    b, l_max = 16, 40
    enc = np.full((b, l_max), 4, np.int32)
    lengths = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(24, l_max + 1))
        s = int(rng.integers(0, len(genome) - n))
        seq = genome[s : s + n].astype(np.int32)
        mut = rng.random(n) < 0.05
        seq[mut] = rng.integers(0, 4, int(mut.sum()))
        enc[i, :n] = seq
        lengths[i] = n

    want, n1, n2, n3, ovf = FP.fmi_pipeline_batch(
        {k: jnp.asarray(v) for k, v in index.items()}, enc, lengths,
        min_seed_len=15)
    handles = dp.fmi_pipeline_index_sharded(mesh8, index, enc, lengths,
                                            min_seed_len=15)
    got, g1, g2, g3, govf = FP.fmi_pipeline_collect(handles, b)
    assert (g1, g2, g3, govf) == (n1, n2, n3, ovf)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)


def test_sharded_index_files_roundtrip_and_search(mesh8, tmp_path):
    """Sharded on-disk index (SURVEY §5 checkpoint/resume): per-host shard
    files reassemble bit-exactly, and the 3-phase pipeline over a global
    cp_pack built from the SHARD FILES (the multi-host load path) matches
    the unsharded engine."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from genomicsbench_palisade_tpu.index import fmi_index as FI
    from genomicsbench_palisade_tpu.index.builder import build_arrays
    from genomicsbench_palisade_tpu.ops import fmi_pipeline as FP

    rng = np.random.default_rng(23)
    genome = rng.integers(0, 4, 5000).astype(np.uint8)
    idx = build_arrays(genome, sa_compression=True)
    prefix = str(tmp_path / "idx")
    n_shards = 4
    paths = FI.save_npz_sharded(idx, prefix, n_shards)
    assert len(paths) == n_shards + 1

    # 1) reassembly is bit-exact (incl. SA sample arrays)
    back = FI.load_npz_sharded(prefix)
    np.testing.assert_array_equal(back.cp_count, idx.cp_count)
    np.testing.assert_array_equal(back.one_hot_hi, idx.one_hot_hi)
    np.testing.assert_array_equal(back.one_hot_lo, idx.one_hot_lo)
    np.testing.assert_array_equal(back.sa_ms_byte, idx.sa_ms_byte)
    np.testing.assert_array_equal(back.sa_ls_word, idx.sa_ls_word)
    assert back.sa_compression and back.ref_seq_len == idx.ref_seq_len
    assert back.sentinel_index == idx.sentinel_index

    # 2) per-shard loads carry coherent geometry and packed rows
    shards = [FI.load_npz_shard(prefix, i) for i in range(n_shards)]
    rows = shards[0]["cp_pack"].shape[0]
    assert all(s["cp_pack"].shape[0] == rows for s in shards)
    assert [s["block_start"] for s in shards] == [i * rows for i in range(n_shards)]

    # 3) pipeline over cp_pack assembled from the shard files (each host
    # contributes its row range) == unsharded pipeline, bit for bit
    cp_global_host = np.concatenate([s["cp_pack"] for s in shards])
    cp_global = jax.device_put(
        cp_global_host, NamedSharding(mesh8, PartitionSpec(M.DP_AXIS, None)))
    index = idx.as_device_arrays()
    b, l_max = 8, 32
    enc = np.full((b, l_max), 4, np.int32)
    lengths = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(20, l_max + 1))
        s = int(rng.integers(0, len(genome) - n))
        enc[i, :n] = genome[s : s + n]
        lengths[i] = n
    want, n1, n2, n3, ovf = FP.fmi_pipeline_batch(
        {k: jnp.asarray(v) for k, v in index.items()}, enc, lengths,
        min_seed_len=15)
    handles = dp.fmi_pipeline_index_sharded(
        mesh8, index, enc, lengths, min_seed_len=15,
        cp_pack_global=cp_global)
    got, g1, g2, g3, govf = FP.fmi_pipeline_collect(handles, b)
    assert (g1, g2, g3, govf) == (n1, n2, n3, ovf)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)
