"""Event detection + scaling oracle (f5c events.c / align.c MoM)."""

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops.oracle import events as E


def _step_signal(rng, n_steps=40, dwell=20, noise=0.3):
    """Piecewise-constant signal with clear level jumps."""
    levels = rng.uniform(60, 120, n_steps)
    # ensure consecutive levels differ enough to segment
    for i in range(1, n_steps):
        if abs(levels[i] - levels[i - 1]) < 8:
            levels[i] = levels[i - 1] + 10
    sig = np.repeat(levels, dwell) + rng.normal(0, noise, n_steps * dwell)
    return sig.astype(np.float32), levels


def test_tstat_matches_scalar_reference():
    """Vectorized t-stat equals a direct scalar transcription of events.c."""
    rng = np.random.default_rng(0)
    data = rng.normal(80, 10, 257).astype(np.float32)
    sums, sumsqs = E.compute_sum_sumsq(data)
    for w in (3, 6):
        got = E.compute_tstat(sums, sumsqs, len(data), w)
        want = np.zeros(len(data), dtype=np.float32)
        wf = np.float32(w)
        for i in range(w, len(data) - w + 1):
            sum1, sumsq1 = sums[i], sumsqs[i]
            if i > w:
                sum1 -= sums[i - w]
                sumsq1 -= sumsqs[i - w]
            sum2 = np.float32(sums[i + w] - sums[i])
            sumsq2 = np.float32(sumsqs[i + w] - sumsqs[i])
            mean1 = np.float32(sum1 / wf)
            mean2 = sum2 / wf
            cv = np.float32(sumsq1 / wf - mean1 * mean1 + sumsq2 / wf - mean2 * mean2)
            cv = max(cv, np.finfo(np.float32).tiny)
            want[i] = np.float32(
                abs(np.float64(mean2 - mean1)) / np.sqrt(np.float64(cv / wf))
            )
        np.testing.assert_array_equal(got, want)


def test_detect_events_segments_steps():
    rng = np.random.default_rng(1)
    sig, levels = _step_signal(rng)
    ev = E.detect_events(sig)
    # events tile the signal: first starts at 0, CADLAG, last ends at n
    assert ev["start"][0] == 0
    ends = ev["start"][1:]
    assert np.all(np.asarray(ends, np.int64) > np.asarray(ev["start"][:-1], np.int64))
    assert int(ev["start"][-1] + ev["length"][-1]) == len(sig)
    # scrappie over-segments by design (stay transitions absorb it later);
    # what matters is boundary RECALL: every true level jump must be within
    # a few samples of some detected event start
    starts = np.asarray(ev["start"], np.int64)
    dwell = 20
    for b in range(dwell, len(sig), dwell):
        assert np.min(np.abs(starts - b)) <= 3, b
    assert len(ev) >= 0.9 * len(levels)
    # event means recoverable: each detected mean close to some true level
    for m in ev["mean"][1:-1]:
        assert np.min(np.abs(levels - m)) < 5.0


def test_event_mean_stdv_exact():
    """create_events mean/stdv match direct computation on the slice."""
    rng = np.random.default_rng(2)
    sig = rng.normal(100, 5, 500).astype(np.float32)
    sums, sumsqs = E.compute_sum_sumsq(sig)
    peaks = [100, 250, 400]
    ev = E.create_events(peaks, sums, sumsqs, len(sig))
    assert len(ev) == 4
    bounds = [0, 100, 250, 400, 500]
    for j in range(4):
        s, e = bounds[j], bounds[j + 1]
        np.testing.assert_allclose(ev["mean"][j], sig[s:e].mean(), rtol=1e-5)
        np.testing.assert_allclose(
            ev["stdv"][j], sig[s:e].std(), rtol=1e-3, atol=1e-3
        )


def test_mom_scaling_recovers_truth():
    """Synthetic events drawn at scale*level+shift recover (shift, scale)."""
    rng = np.random.default_rng(3)
    k = 6
    model = {
        "level_mean": rng.normal(90, 12, 4 ** k).astype(np.float32),
        "level_stdv": np.ones(4 ** k, dtype=np.float32),
    }
    seq = "".join(rng.choice(list("ACGT"), 400))
    from genomicsbench_palisade_tpu.ops.oracle.abea import get_kmer_rank

    # NB the reference's MoM shift estimator is exact only at scale=1
    # (shift couples into scale otherwise, align.c:74); test the clean case
    true_shift, true_scale = 14.0, 1.0
    means = np.array(
        [true_scale * model["level_mean"][get_kmer_rank(seq[i:i + k])] + true_shift
         for i in range(len(seq) - k + 1)], dtype=np.float32)
    ev = np.zeros(len(means), dtype=[("start", np.uint64), ("length", np.float32),
                                     ("mean", np.float32), ("stdv", np.float32)])
    ev["mean"] = means
    shift, scale = E.estimate_scalings_using_mom(seq, model, ev)
    assert abs(shift - true_shift) < 0.2
    assert abs(scale - true_scale) < 0.02


def test_median_mad_quantile():
    x = np.array([3.0, 1.0, 2.0, 5.0, 4.0], np.float32)
    # order statistic n/2 = index 2 of sorted -> 3.0
    assert E.medianf(x) == np.float32(3.0)
    assert E.madf(x) == np.float32(1.0 * 1.4826)
    assert E.quantilef(x, 1.0) == np.float32(5.0)
    assert E.quantilef(x, 0.5) == np.float32(3.0)


def test_trim_raw_by_mad():
    rng = np.random.default_rng(4)
    flat = np.full(500, 80.0, np.float32)  # stall: zero variance
    active = rng.normal(90, 10, 1000).astype(np.float32)
    sig = np.concatenate([flat, active, flat])
    start, end = E.trim_raw_by_mad(sig, chunk_size=100, perc=0.0)
    assert start >= 400 and end <= len(sig) - 400
    assert end > start


def test_native_detect_events_matches_python():
    from genomicsbench_palisade_tpu.io.native import available, detect_events_native

    if not available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(11)
    for n in (200, 999, 5000):
        sig, _ = _step_signal(rng, n_steps=max(n // 20, 3), dwell=20, noise=1.0)
        sig = sig[:n]
        want = E.detect_events(sig, use_native=False)
        got = detect_events_native(sig)
        assert len(got) == len(want)
        np.testing.assert_array_equal(got["start"], want["start"])
        np.testing.assert_array_equal(got["length"], want["length"])
        np.testing.assert_array_equal(got["mean"], want["mean"])
        np.testing.assert_array_equal(got["stdv"], want["stdv"])
