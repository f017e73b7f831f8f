"""On-chip parity harness for the Pallas production kernels.

pytest runs on a virtual CPU mesh (pallas TPU kernels only run there in
interpret mode, too slow for real sizes), so this script re-verifies
every Pallas kernel against its reference implementation ON THE REAL
CHIP at production shapes:

  phmm  pallas vs jax scan        (bit-exact f32)
  bsw   pallas vs jax scan        (bit-exact i32, 6 outputs)
  chain pallas vs vmapped scan    (bit-exact i32, 3 outputs)
  abea  pallas vs vmapped scan    (identical alignments incl. QC drops)
  poa   device DP vs host oracle  (identical alignments, 5 rounds/graph)
  grm   device vs host f64        (2e-5, plink2 double-precision contract)

Usage: python tools/chip_parity.py   — prints one OK/FAIL line per kernel
and exits nonzero on any failure.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def check_phmm():
    import jax

    from genomicsbench_palisade_tpu.ops import phmm as P
    from genomicsbench_palisade_tpu.ops.phmm_pallas import phmm_forward_pallas

    rng = np.random.default_rng(0)
    reads, haps, pairs = [], [], []
    for i in range(256):
        rl, hl = int(rng.integers(5, 250)), int(rng.integers(5, 300))
        reads.append({"bases": rng.integers(0, 5, rl),
                      "q": rng.integers(36, 60, rl),
                      "i": rng.integers(36, 60, rl),
                      "d": rng.integers(36, 60, rl),
                      "c": rng.integers(36, 60, rl)})
        haps.append(rng.integers(0, 5, hl))
        pairs.append((i, i))
    batch = P.prepare_batch(reads, haps, pairs, r_pad=256, h_pad=320)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    want = np.asarray(P.phmm_forward(batch)[1])
    got = np.asarray(phmm_forward_pallas(batch)[1])
    assert np.array_equal(got, want), "phmm mismatch"


def check_phmm_large():
    """The large-dataset geometry (reads <=250, haps <=473 -> h_pad 512,
    PairHMMUnitTest.cpp:1-34): the 512 bucket must stay bit-exact too."""
    import jax

    from genomicsbench_palisade_tpu.ops import phmm as P
    from genomicsbench_palisade_tpu.ops.phmm_pallas import phmm_forward_pallas

    rng = np.random.default_rng(7)
    reads, haps, pairs = [], [], []
    for i in range(128):
        rl, hl = int(rng.integers(5, 250)), int(rng.integers(303, 473))
        reads.append({"bases": rng.integers(0, 5, rl),
                      "q": rng.integers(36, 60, rl),
                      "i": rng.integers(36, 60, rl),
                      "d": rng.integers(36, 60, rl),
                      "c": rng.integers(36, 60, rl)})
        haps.append(rng.integers(0, 5, hl))
        pairs.append((i, i))
    batch = P.prepare_batch(reads, haps, pairs, r_pad=256, h_pad=512)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    want = np.asarray(P.phmm_forward(batch)[1])
    got = np.asarray(phmm_forward_pallas(batch)[1])
    assert np.array_equal(got, want), "phmm h512 mismatch"


def check_chain_ring():
    """Reference-scale call sizes (87k max) go through the multi-chunk
    ring-carry path (n_pad > NC_RING): parity vs the XLA scan at 12k."""
    import jax.numpy as jnp

    from genomicsbench_palisade_tpu.ops import chain as C
    from genomicsbench_palisade_tpu.ops.chain_pallas import gap_fixed_point

    rng = np.random.default_rng(3)
    b, n, w = 8, 12_000, 64
    n_pad = C.pad_anchor_bucket(n)
    assert n_pad > C.NC_RING and n_pad % C.NC_RING == 0, n_pad
    calls = []
    for _ in range(b):
        xs = np.cumsum(rng.integers(1, 40, n)).astype(np.int64) + 1000
        ys = np.maximum(xs + rng.integers(-300, 300, n), 0)
        calls.append(C.prepare_call(xs, ys, avg_qspan=float(rng.uniform(10, 30))))
    # an infeasible-slope call rides along: production splits it to the
    # scan sub-batch instead of demoting (or failing) the whole bucket
    xs = np.cumsum(rng.integers(1, 40, n)).astype(np.int64) + 1000
    ys = np.maximum(xs + rng.integers(-300, 300, n), 0)
    calls[0] = C.prepare_call(xs, ys, avg_qspan=25.0)

    def p(a, fill=0):
        return np.pad(a, (0, n_pad - len(a)), constant_values=fill)

    stack = {k: np.stack([p(c["x_lo"].view(np.int32) if k == "x_lo" else c[k])
                          if k != "gap_table" else c[k] for c in calls])
             for k in ("x_lo", "qi", "qspan", "st_eff", "gap_table")}
    _, _, ok = gap_fixed_point(stack["gap_table"], 500)
    assert (not ok[0]) and ok[1:].all(), "fixture should be mixed"
    args = tuple(jnp.asarray(stack[k])
                 for k in ("x_lo", "qi", "qspan", "st_eff", "gap_table"))
    lens = jnp.full(b, n, np.int32)
    want = C.chain_dp_device_batch(*args, lens, w, n_pad, 5000, 5000, 500)
    got = C.chain_calls_batched(calls, w=w, n_pad=n_pad)
    assert C.LAST_ROUTE == {"pallas": b - 1, "scan": 1}, C.LAST_ROUTE
    for oi, name in enumerate(("scores", "parents", "peaks")):
        wa = np.asarray(want[oi])[:, :n]
        for ci in range(b):
            assert np.array_equal(got[ci][oi], wa[ci]), \
                f"chain ring {name} call {ci}"


def check_chain_packed():
    """Lane-packed batching (chain_calls_packed): mixed-size calls share
    kernel lanes at production lane_tile=128 / nc=1024; parity vs the
    per-call scan engine, including an infeasible-slope rider."""
    from genomicsbench_palisade_tpu.ops import chain as C

    rng = np.random.default_rng(11)
    sizes = rng.integers(80, 4000, 300)
    calls = []
    for i, n in enumerate(sizes):
        xs = np.cumsum(rng.integers(1, 40, int(n))).astype(np.int64) + 1000
        ys = np.maximum(xs + rng.integers(-300, 300, int(n)), 0)
        q = 25.0 if i == 7 else float(rng.uniform(10, 30))
        calls.append(C.prepare_call(xs, ys, avg_qspan=q))
    got = C.chain_calls_packed(calls)
    assert C.LAST_ROUTE["scan"] >= 1 and C.LAST_ROUTE["pallas"] >= 290, \
        C.LAST_ROUTE
    for ci in rng.choice(len(calls), 12, replace=False):
        c = calls[int(ci)]
        w = max(int(2 ** np.ceil(np.log2(max(c["w_need"], 1)))), 16)
        want = C.chain_call(c, w=w, n_pad=int(c["n"]), engine="scan")
        for oi, name in enumerate(("scores", "parents", "peaks")):
            assert np.array_equal(got[int(ci)][oi], want[oi]), \
                f"chain packed {name} call {ci}"


def check_bsw():
    import jax

    from genomicsbench_palisade_tpu.ops import bsw as W
    from genomicsbench_palisade_tpu.ops.bsw_pallas import bsw_batch_pallas

    rng = np.random.default_rng(1)
    pairs = []
    for _ in range(512):
        ql, tl = int(rng.integers(5, 128)), int(rng.integers(5, 256))
        t = rng.integers(0, 5, tl)
        q = rng.integers(0, 5, ql)
        if rng.random() < 0.7 and tl >= ql:
            q = t[:ql].copy()
            mut = rng.random(ql) < 0.1
            q[mut] = rng.integers(0, 4, int(mut.sum()))
        pairs.append((q, t, int(rng.integers(1, 80))))
    batch = W.prepare_pairs(pairs, q_pad=128, t_pad=256)
    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
    want = {k: np.asarray(v) for k, v in W.bsw_batch(batch).items()}
    got = {k: np.asarray(v) for k, v in bsw_batch_pallas(batch).items()}
    for key in want:
        assert np.array_equal(got[key], want[key]), f"bsw {key} mismatch"


def check_chain():
    import jax.numpy as jnp

    from genomicsbench_palisade_tpu.ops import chain as C
    from genomicsbench_palisade_tpu.ops.chain_pallas import gap_fixed_point

    rng = np.random.default_rng(2)
    b, n, w = 128, 1024, 64
    calls = []
    for i in range(b):
        xs = np.cumsum(rng.integers(1, 40, n)).astype(np.int64) + 1000
        ys = np.maximum(xs + rng.integers(-300, 300, n), 0)
        # two exact-quarter avg_qspans (no fixed-point slope) ride along:
        # production must split them to the scan sub-batch
        q = 25.0 if i in (3, 77) else float(rng.uniform(10, 30))
        calls.append(C.prepare_call(xs, ys, avg_qspan=q))
    stack = {k: np.stack([(c["x_lo"].view(np.int32) if k == "x_lo" else c[k])
                          for c in calls])
             for k in ("x_lo", "qi", "qspan", "st_eff", "gap_table")}
    _, _, ok = gap_fixed_point(stack["gap_table"], 500)
    assert not ok[3] and not ok[77] and ok.sum() == b - 2, "mixed fixture"
    args = tuple(jnp.asarray(stack[k])
                 for k in ("x_lo", "qi", "qspan", "st_eff", "gap_table"))
    want = C.chain_dp_device_batch(*args, jnp.full(b, n, np.int32),
                                   w, n, 5000, 5000, 500)
    got = C.chain_calls_batched(calls, w=w, n_pad=n)
    assert C.LAST_ROUTE == {"pallas": b - 2, "scan": 2}, C.LAST_ROUTE
    for oi, name in enumerate(("scores", "parents", "peaks")):
        wa = np.asarray(want[oi])
        for ci in range(b):
            assert np.array_equal(got[ci][oi], wa[ci]), \
                f"chain {name} call {ci}"


def check_abea():
    from genomicsbench_palisade_tpu.ops import abea as A
    from genomicsbench_palisade_tpu.ops.abea_pallas import (
        align_events_batch_pallas)
    from genomicsbench_palisade_tpu.ops.oracle.abea import get_kmer_rank

    rng = np.random.default_rng(3)
    k = 6
    model = {"level_mean": rng.normal(90, 12, 4096).astype(np.float32),
             "level_stdv": (rng.random(4096) * 2 + 1).astype(np.float32)}
    model["level_log_stdv"] = np.log(model["level_stdv"]).astype(np.float32)
    seqs, evs, scales, shifts = [], [], [], []
    for i in range(24):
        n = int(rng.integers(40, 220))
        seq = "".join(rng.choice(list("ACGT"), n))
        raw = []
        for p in range(len(seq) - k + 1):
            r = get_kmer_rank(seq[p:p + k])
            raw.extend(model["level_mean"][r]
                       + rng.normal(0, 0.4, int(rng.integers(1, 3))))
        seqs.append(seq)
        evs.append(np.array(raw, np.float32))
        scales.append(1.0)
        shifts.append(0.0)
    seqs.append("".join(rng.choice(list("ACGT"), 100)))  # QC-drop read
    evs.append(rng.normal(0, 1, 150).astype(np.float32))
    scales.append(1.0)
    shifts.append(0.0)
    want = A.align_events_batch(seqs, evs, model, scales, shifts,
                                use_pallas=False)
    got = align_events_batch_pallas(seqs, evs, model, scales, shifts)
    assert got == want, "abea mismatch (device walk)"
    got_host = align_events_batch_pallas(seqs, evs, model, scales, shifts,
                                         device_walk=False)
    assert got_host == want, "abea mismatch (host traceback)"


def check_abea_golden():
    """Device walk vs the 25 f5c-built reference fixtures (exact pairs)."""
    import json

    from genomicsbench_palisade_tpu.io import signal as SIG
    from genomicsbench_palisade_tpu.ops.abea_pallas import (
        align_events_batch_pallas)
    from genomicsbench_palisade_tpu.ops.oracle import events as EO

    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "tests"))
    from generate_fixtures import _pore_levels

    with open(root / "tests" / "fixtures" / "abea_golden.json") as f:
        cases = json.load(f)["cases"]
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".tsv",
                                     delete=False) as f:
        f.write("kmer\tlevel_mean\tlevel_stdv\n")
        for km, mean in _pore_levels().items():
            f.write(f"{km}\t{mean:.2f}\t1.50\n")
        pore = f.name
    model = SIG.load_pore_model(pore)
    seqs, evs, scales, shifts, wants = [], [], [], [], []
    for case in cases:
        sig = np.array([float(x) for x in case["signal"]], np.float32)
        ev = EO.detect_events(sig)
        sh, sc = EO.estimate_scalings_using_mom(case["seq"], model, ev)
        seqs.append(case["seq"])
        evs.append(np.asarray(ev["mean"], np.float32))
        scales.append(float(sc))
        shifts.append(float(sh))
        wants.append([tuple(p) for p in case["pairs"]])
    got = align_events_batch_pallas(seqs, evs, model, scales, shifts)
    bad = [i for i, (g, w) in enumerate(zip(got, wants))
           if [tuple(p) for p in g] != w]
    assert not bad, f"abea golden mismatch on cases {bad}"


def check_poa():
    from genomicsbench_palisade_tpu.ops import poa as PP
    from genomicsbench_palisade_tpu.ops.oracle.poa import (
        PoaGraph, convex_nw_align)

    rng = np.random.default_rng(5)
    w_n, s_n, length = 8, 5, 120
    batches = []
    for _ in range(w_n):
        base = "".join(rng.choice(list("ACGT"), length))
        seqs = []
        for _ in range(s_n):
            s = list(base)
            for pos in np.nonzero(rng.random(length) < 0.06)[0]:
                s[pos] = "ACGT"[rng.integers(0, 4)]
            seqs.append("".join(s))
        batches.append(seqs)
    graphs = [PoaGraph() for _ in range(w_n)]
    for k in range(s_n):
        alns = PP.align_batch(graphs, [b[k] for b in batches])
        for gi in range(w_n):
            want = convex_nw_align(batches[gi][k], graphs[gi])
            assert alns[gi] == want, f"poa window {gi} round {k}"
            graphs[gi].add_alignment(alns[gi], batches[gi][k])


def check_grm():
    from genomicsbench_palisade_tpu.ops import grm as G

    rng = np.random.default_rng(4)
    geno = rng.choice([0, 1, 2, 3], size=(512, 256),
                      p=[.5, .3, .15, .05]).astype(np.int8)
    got, got_cnt = G.compute_grm(geno, block=128)
    z, v, _ = G.normalize_block_np(geno)
    sums = z.astype(np.float64).T @ z.astype(np.float64)
    cnts = v.astype(np.float64).T @ v.astype(np.float64)
    want = (sums / np.maximum(cnts, 1.0)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got_cnt, cnts.astype(np.float32))


def main():
    failures = 0
    for name, fn in (("phmm", check_phmm), ("phmm-large", check_phmm_large),
                     ("bsw", check_bsw),
                     ("chain", check_chain), ("chain-ring", check_chain_ring),
                     ("chain-packed", check_chain_packed),
                     ("abea", check_abea),
                     ("abea-golden", check_abea_golden),
                     ("poa", check_poa), ("grm", check_grm)):
        try:
            fn()
            print(f"OK   {name}")
        except Exception as e:
            failures += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
