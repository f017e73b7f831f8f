"""bsw JAX kernel: exact integer parity vs golden fixtures and the oracle."""

import json

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import bsw as B
from genomicsbench_palisade_tpu.ops.oracle import bsw as BO

KEYS = ("score", "qle", "tle", "gtle", "gscore", "max_off")


def _run(pairs, params=BO.DEFAULT_PARAMS):
    batch = B.prepare_pairs(pairs, params)
    out = {k: np.asarray(v) for k, v in B.bsw_batch(batch, B._params_tuple(params)).items()}
    return out


def test_bsw_vs_reference_fixtures(fixtures_dir):
    cases = json.load(open(fixtures_dir / "bsw_golden.json"))
    pairs = [(np.array(c["query"]), np.array(c["target"]), c["h0"]) for c in cases]
    out = _run(pairs)
    for i, c in enumerate(cases):
        got = {k: int(out[k][i]) for k in KEYS}
        assert got == c["out"], (i, got, c["out"])


def test_bsw_vs_oracle_random_stress():
    rng = np.random.default_rng(77)
    pairs = []
    for _ in range(200):
        tl = int(rng.integers(1, 260))
        ql = int(rng.integers(1, 130))
        mode = rng.random()
        if mode < 0.5:  # similar sequences (typical extension pairs)
            base = rng.integers(0, 4, max(tl, ql))
            t = np.where(rng.random(tl) < 0.08, rng.integers(0, 4, tl), base[:tl])
            q = np.where(rng.random(ql) < 0.08, rng.integers(0, 4, ql), base[:ql])
        elif mode < 0.8:  # random with ambigs
            t = rng.integers(0, 5, tl)
            q = rng.integers(0, 5, ql)
        else:  # adversarial: long indels
            base = rng.integers(0, 4, max(tl, ql) + 50)
            t = base[:tl]
            q = np.concatenate([base[25 : 25 + max(ql - 10, 0)], rng.integers(0, 4, min(10, ql))])[:ql]
        h0 = int(rng.integers(1, 100))
        pairs.append((q, t, h0))
    out = _run(pairs)
    for i, (q, t, h0) in enumerate(pairs):
        want = BO.scalar_banded_swa(q, t, h0)
        got = {k: int(out[k][i]) for k in KEYS}
        assert got == want, (i, got, want)


def test_bsw_tiny_edge_cases():
    pairs = [
        (np.array([0]), np.array([0]), 1),  # single-base match
        (np.array([1]), np.array([0]), 1),  # single-base mismatch
        (np.array([0, 1, 2, 3]), np.array([0, 1, 2, 3]), 30),
        (np.array([4, 4, 4]), np.array([4, 4]), 10),  # all-ambig
        (np.array([0] * 100), np.array([0] * 100), 1),  # long perfect
    ]
    out = _run(pairs)
    for i, (q, t, h0) in enumerate(pairs):
        want = BO.scalar_banded_swa(q, t, h0)
        got = {k: int(out[k][i]) for k in KEYS}
        assert got == want, (i, got, want)
