"""A/B: bsw raw int8 wire vs 2-bit packed wire, one process, interleaved.

The dataset-scale bsw wall is the axon relay shipping sequence bytes
(BSW_SCALE.json; ~70 MB/s).  This times the full dispatch->fetch cycle
for identical chunks through both wire formats, alternating A/B within
one process (this VM's clock swings +-25% across minutes, CLAUDE.md).

Usage: python tools/bsw_wire_ab.py [--pairs 262144] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def synth_chunks(n_pairs, chunk, q_pad, t_pad, rng):
    """Dataset-regime pairs (q 96..151, t 192..256) pre-padded per chunk."""
    chunks = []
    done = 0
    while done < n_pairs:
        m = min(chunk, n_pairs - done)
        ql = rng.integers(96, min(152, q_pad + 1), m).astype(np.int32)
        tl = rng.integers(192, t_pad + 1, m).astype(np.int32)
        h0 = rng.integers(1, 80, m).astype(np.int32)
        q = rng.integers(0, 4, (chunk, q_pad), dtype=np.uint8)
        t = rng.integers(0, 4, (chunk, t_pad), dtype=np.uint8)
        qm = np.arange(q_pad)[None, :] >= ql[:, None]
        tm = np.arange(t_pad)[None, :] >= tl[:, None]
        q[:m][qm] = 0
        t[:m][tm] = 0
        chunks.append((q, t, np.pad(ql, (0, chunk - m)),
                       np.pad(tl, (0, chunk - m)), np.pad(h0, (0, chunk - m))))
        done += m
    return chunks


def run_raw(chunks, ptuple):
    from genomicsbench_palisade_tpu.ops.bsw_pallas import bsw_batch_pallas

    pend = []
    for q, t, ql, tl, h0 in chunks:
        rq = np.where(np.arange(q.shape[1])[None, :] < ql[:, None], q, 4).astype(np.int8)
        rt = np.where(np.arange(t.shape[1])[None, :] < tl[:, None], t, 4).astype(np.int8)
        out = bsw_batch_pallas({"query": rq, "target": rt,
                                "qlen": ql, "tlen": tl, "h0": h0}, ptuple)
        pend.append(out)
    return [np.asarray(o["score"]) for o in pend]


def run_packed(chunks, ptuple):
    from genomicsbench_palisade_tpu.ops.bsw_pallas import (
        bsw_batch_pallas_packed, pack_codes_2bit)

    pend = []
    for q, t, ql, tl, h0 in chunks:
        out = bsw_batch_pallas_packed(
            {"qpack": pack_codes_2bit(q), "tpack": pack_codes_2bit(t),
             "qlen": ql, "tlen": tl, "h0": h0},
            q.shape[1], t.shape[1], ptuple)
        pend.append(out)
    return [np.asarray(o["score"]) for o in pend]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=262144)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--q-pad", type=int, default=256)
    ap.add_argument("--t-pad", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from genomicsbench_palisade_tpu.ops import bsw as B
    from genomicsbench_palisade_tpu.ops.oracle.bsw import DEFAULT_PARAMS
    from genomicsbench_palisade_tpu.utils.compile_cache import enable

    enable()
    ptuple = B._params_tuple(DEFAULT_PARAMS)
    rng = np.random.default_rng(0)
    chunks = synth_chunks(args.pairs, args.chunk, args.q_pad, args.t_pad, rng)
    wire_raw = sum(q.nbytes + t.nbytes for q, t, *_ in chunks)
    n = args.pairs

    # warm both compiles off the clock
    small = synth_chunks(256, 128, args.q_pad, args.t_pad, rng)
    s_raw = run_raw(small, ptuple)
    s_pk = run_packed(small, ptuple)
    for a, b in zip(s_raw, s_pk):
        assert (a == b).all(), "packed wire mismatch"

    rows = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        out_a = run_raw(chunks, ptuple)
        t_raw = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_b = run_packed(chunks, ptuple)
        t_pk = time.perf_counter() - t0
        for a, b in zip(out_a, out_b):
            assert (a == b).all(), "packed wire mismatch"
        rows.append({"rep": rep, "raw_s": round(t_raw, 3),
                     "packed_s": round(t_pk, 3),
                     "raw_pairs_per_s": round(n / t_raw, 1),
                     "packed_pairs_per_s": round(n / t_pk, 1)})
        print(json.dumps(rows[-1]), flush=True)

    best_raw = min(r["raw_s"] for r in rows)
    best_pk = min(r["packed_s"] for r in rows)
    print(json.dumps({
        "pairs": n, "wire_raw_mb": round(wire_raw / 1e6, 1),
        "wire_packed_mb": round(wire_raw / 4e6, 1),
        "best_raw_s": best_raw, "best_packed_s": best_pk,
        "speedup": round(best_raw / best_pk, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
