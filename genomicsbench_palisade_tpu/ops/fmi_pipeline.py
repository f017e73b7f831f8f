"""The fmi benchmark's 3-phase SMEM pipeline (host-orchestrated).

Mirrors benchmarks/fmi/fmi.cpp:229-345 per read batch:
  phase 1: all-position SMEMs, min_intv=1
  phase 2: reseed — SMEMs with length >= split_len AND s <= splitWidth
           restart a one-pos search at their midpoint with min_intv=s+1
  phase 3: LAST strategy, max_intv=maxMemIntv, minSeedLen+1
then rid-adjust and sort by (rid asc, m asc, n desc).

Device kernels do the batched searches; filtering/sorting happens on the
host between phases (numpy), exactly as the reference driver interleaves
its phases on the CPU.
"""

from __future__ import annotations

import numpy as np

from . import fmi as F

SPLIT_WIDTH = 10
MAX_MEM_INTV = 20
SPLIT_FACTOR = 1.5


def _extract(bufs, counts, rid_of_lane):
    """Match buffers -> numpy struct list columns (rid, m, n, k, l, s)."""
    bufs = {key: np.asarray(v) for key, v in bufs.items()}
    counts = np.asarray(counts)
    lanes = np.repeat(np.arange(len(counts)), counts)
    slot = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.zeros(0, int)
    out = {
        "rid": rid_of_lane[lanes] if len(lanes) else np.zeros(0, np.int64),
    }
    for key in ("m", "n", "k", "l", "s"):
        out[key] = bufs[key][lanes, slot] if len(lanes) else np.zeros(0, np.int64)
    return out


def _concat(parts):
    keys = ("rid", "m", "n", "k", "l", "s")
    return {k: np.concatenate([p[k] for p in parts]) for k in keys}


def fmi_pipeline_batch(
    index,
    enc: np.ndarray,
    readlen: np.ndarray,
    min_seed_len: int = 19,
    split_width: int = SPLIT_WIDTH,
    max_mem_intv: int = MAX_MEM_INTV,
    split_factor: float = SPLIT_FACTOR,
    rid_base: int = 0,
):
    """One batch of reads through all three phases.

    enc: [B, L] int32 codes (0-3, >=4 ambiguous); readlen: [B].
    Returns (sorted smem dict of numpy arrays, n1, n2, n3, overflow_any).
    """
    import jax.numpy as jnp

    b = enc.shape[0]
    enc_d = jnp.asarray(enc)
    rl_d = jnp.asarray(readlen)
    split_len = int(min_seed_len * split_factor + 0.499)
    lane_rid = np.arange(b, dtype=np.int64)

    # phase 1
    bufs1, counts1, ovf1 = F.smems_all_pos_batch(
        index, enc_d, rl_d, jnp.ones(b, jnp.int32), min_seed_len
    )
    s1 = _extract(bufs1, counts1, lane_rid)
    n1 = len(s1["m"])

    # phase 2 filter (fmi.cpp:293-302): keep len >= split_len AND s <= splitWidth
    length = s1["n"] + 1 - s1["m"]
    keep = (length >= split_len) & (s1["s"] <= split_width)
    n2 = 0
    if keep.any():
        rids = s1["rid"][keep].astype(np.int64)
        mid = ((s1["n"][keep] + 1 + s1["m"][keep]) >> 1).astype(np.int32)
        miv = (s1["s"][keep] + 1).astype(np.int32)
        bufs2, counts2, _nx, ovf2 = F.smems_one_pos_batch(
            index,
            enc_d[jnp.asarray(rids)],
            rl_d[jnp.asarray(rids)],
            jnp.asarray(mid),
            jnp.asarray(miv),
            min_seed_len,
        )
        s2 = _extract(bufs2, counts2, rids)
        n2 = len(s2["m"])
    else:
        s2 = {k: np.zeros(0, np.int64) for k in ("rid", "m", "n", "k", "l", "s")}
        ovf2 = np.zeros(1, bool)

    # phase 3: LAST
    bufs3, counts3, ovf3 = F.bwt_seed_strategy_batch(
        index, enc_d, rl_d, jnp.full(b, max_mem_intv, jnp.int32), min_seed_len + 1
    )
    s3 = _extract(bufs3, counts3, lane_rid)
    n3 = len(s3["m"])

    allm = _concat([s1, s2, s3])
    allm["rid"] = allm["rid"] + rid_base
    order = np.lexsort((-allm["n"].astype(np.int64), allm["m"], allm["rid"]))
    allm = {k: v[order] for k, v in allm.items()}
    ovf = bool(np.asarray(ovf1).any() or np.asarray(ovf2).any() or np.asarray(ovf3).any())
    return allm, n1, n2, n3, ovf
