"""Lane-packed chain batching (ops/chain.chain_calls_packed): several
calls share one kernel lane, concatenated along the anchor axis with
st_eff fencing + per-anchor gap slopes (chain_pallas per_anchor mode).
Parity vs the scan engine per call, interpret mode (no chip)."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from genomicsbench_palisade_tpu.ops import chain as C


def _mk_calls(rng, sizes, qspans):
    calls = []
    for n, q in zip(sizes, qspans):
        xs = np.cumsum(rng.integers(1, 40, n)).astype(np.int64) + 500
        ys = np.maximum(xs + rng.integers(-200, 200, n), 0)
        calls.append(C.prepare_call(xs, ys, avg_qspan=float(q)))
    return calls


def test_packed_lanes_match_scan(monkeypatch):
    """8 mixed-size calls forced into 2 lanes (4 calls per lane): packed
    outputs must equal the per-call scan engine bit-exactly, including
    call-local parent indices.  avg_qspan=25.0 (no exact fixed-point
    slope — VERDICT r2's bench_chain failure case) must route to the
    scan fallback, not poison the packed lanes."""
    rng = np.random.default_rng(12)
    sizes = [40, 170, 90, 200, 55, 130, 75, 160]
    qspans = [20.1, 18.7, 25.0, 23.3, 31.9, 19.87, 14.2, 27.6]
    calls = _mk_calls(rng, sizes, qspans)

    # full-window expectations: the packed path sizes w from w_need
    want = [C.chain_call(c, w=256, n_pad=256, engine="scan") for c in calls]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        got = C.chain_calls_packed(calls, lane_tile=2, force_kernel=True,
                                   nc=256)
    assert C.LAST_ROUTE == {"pallas": 7, "scan": 1}, C.LAST_ROUTE
    for g, w_ in zip(got, want):
        for oi in range(3):
            np.testing.assert_array_equal(g[oi], w_[oi])


def test_packed_empty_and_single():
    """Degenerate inputs: empty calls short-circuit, and on the CPU
    backend everything falls back through the bucketed path."""
    rng = np.random.default_rng(3)
    calls = _mk_calls(rng, [0, 60], [20.0, 20.0])
    assert calls[0]["n"] == 0
    out = C.chain_calls_packed(calls)  # cpu backend -> scan fallback
    assert out[0][0].shape == (0,)
    want = C.chain_call(calls[1], engine="scan")
    for oi in range(3):
        np.testing.assert_array_equal(out[1][oi], want[oi])


@pytest.mark.slow
def test_packed_multichunk_boundary(monkeypatch):
    """A call crossing the ring-chunk boundary inside a packed lane
    (offset not chunk-aligned) must still match the scan engine —
    exercises the carry hand-off with a call straddling chunks."""
    rng = np.random.default_rng(7)
    sizes = [100, 180]  # packed lane rows [0,180)+[180,280): the second
    #                     call straddles the nc=256 chunk boundary
    calls = _mk_calls(rng, sizes, [19.5, 22.25])
    want = [C.chain_call(c, w=256, n_pad=512, engine="scan") for c in calls]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        got = C.chain_calls_packed(calls, lane_tile=1, force_kernel=True,
                                   nc=256)
    assert C.LAST_ROUTE["pallas"] == 2
    for g, w_ in zip(got, want):
        for oi in range(3):
            np.testing.assert_array_equal(g[oi], w_[oi])


def test_packed_delta_wire_escapes(monkeypatch):
    """The 8-byte delta wire must survive in-call escapes: x jumps past
    u16, qi jumps past i16 in both directions, st fence jumps — every
    escape rides the sparse correction channel and outputs stay
    bit-exact vs the scan engine."""
    rng = np.random.default_rng(77)
    calls = []
    for n in (96, 150):
        steps = rng.integers(1, 40, n).astype(np.int64)
        steps[rng.random(n) < 0.05] = 70_000  # dx escapes
        xs = np.cumsum(steps) + 1_000
        dy = rng.integers(-200, 200, n).astype(np.int64)
        dy[rng.random(n) < 0.05] = 60_000   # +qi escapes
        dy[rng.random(n) < 0.05] = -50_000  # -qi escapes
        ys = np.maximum(xs + dy, 0)
        calls.append(C.prepare_call(np.sort(xs), ys, avg_qspan=19.87))
    want = [C.chain_call(c, w=256, n_pad=256, engine="scan")
            for c in calls]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        got = C.chain_calls_packed(calls, lane_tile=2, force_kernel=True,
                                   nc=256)
    for g, w_ in zip(got, want):
        for oi in range(3):
            np.testing.assert_array_equal(g[oi], w_[oi])
