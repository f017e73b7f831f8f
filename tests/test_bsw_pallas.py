"""Pallas bsw kernel (interpret mode on CPU) vs the JAX scan reference."""

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from genomicsbench_palisade_tpu.ops import bsw as W
from genomicsbench_palisade_tpu.ops import bsw_pallas as WP


def _random_pairs(rng, b, ql_max=60, tl_max=90):
    pairs = []
    for _ in range(b):
        ql = int(rng.integers(5, ql_max))
        tl = int(rng.integers(5, tl_max))
        t = rng.integers(0, 5, tl)  # incl. ambiguous
        q = rng.integers(0, 5, ql)
        if rng.random() < 0.7 and tl >= ql:  # related pair
            q = t[:ql].copy()
            mut = rng.random(ql) < 0.15
            q[mut] = rng.integers(0, 4, int(mut.sum()))
        pairs.append((q, t, int(rng.integers(1, 80))))
    return pairs


def test_bsw_pallas_matches_scan_bitexact():
    rng = np.random.default_rng(0)
    pairs = _random_pairs(rng, 128)
    batch = W.prepare_pairs(pairs, q_pad=64, t_pad=96)
    want = {k: np.asarray(v) for k, v in W.bsw_batch(batch).items()}
    with pltpu.force_tpu_interpret_mode():
        got = {k: np.asarray(v) for k, v in WP.bsw_batch_pallas(batch).items()}
    for key in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
        np.testing.assert_array_equal(got[key], want[key], err_msg=key)


def test_bsw_pallas_matches_oracle():
    from genomicsbench_palisade_tpu.ops.oracle import bsw as WO

    rng = np.random.default_rng(1)
    pairs = _random_pairs(rng, 128)
    batch = W.prepare_pairs(pairs, q_pad=64, t_pad=96)
    with pltpu.force_tpu_interpret_mode():
        got = {k: np.asarray(v) for k, v in WP.bsw_batch_pallas(batch).items()}
    for i, (q, t, h0) in enumerate(pairs):
        want = WO.scalar_banded_swa(q, t, h0, WO.DEFAULT_PARAMS)
        assert got["score"][i] == want["score"], i
        assert got["qle"][i] == want["qle"], i
        assert got["tle"][i] == want["tle"], i
        assert got["gtle"][i] == want["gtle"], i
        assert got["gscore"][i] == want["gscore"], i
        assert got["max_off"][i] == want["max_off"], i


def test_bsw_pallas_vs_reference_fixtures(fixtures_dir):
    """All 300 reference-binary golden cases through the PALLAS kernel
    (interpret mode) at production-shape padding — previously goldens
    only pinned the scan engine."""
    import json

    cases = json.load(open(fixtures_dir / "bsw_golden.json"))
    pairs = [(np.array(c["query"]), np.array(c["target"]), c["h0"])
             for c in cases]
    while len(pairs) % 128:  # kernel batches are full lane tiles
        pairs.append(pairs[0])
    batch = W.prepare_pairs(pairs)
    with pltpu.force_tpu_interpret_mode():
        got = {k: np.asarray(v) for k, v in WP.bsw_batch_pallas(batch).items()}
    for i, c in enumerate(cases):
        for key in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
            assert int(got[key][i]) == c["out"][key], (i, key)
