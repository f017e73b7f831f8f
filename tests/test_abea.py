"""abea: device band-fill + host traceback vs the oracle on synthetic reads."""

import numpy as np
import pytest

from genomicsbench_palisade_tpu.ops import abea as A
from genomicsbench_palisade_tpu.ops.oracle import abea as AO


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(0)
    m = {
        "level_mean": rng.normal(90, 12, 4096).astype(np.float32),
        "level_stdv": (rng.random(4096).astype(np.float32) * 2 + 1),
    }
    m["level_log_stdv"] = np.log(m["level_stdv"]).astype(np.float32)
    return m


def _synth(rng, model, seq, epk=1.8):
    k = 6
    means = []
    for i in range(len(seq) - k + 1):
        r = AO.get_kmer_rank(seq[i : i + k])
        for _ in range(max(1, int(rng.poisson(epk - 1)) + 1)):
            means.append(
                model["level_mean"][r] + rng.normal(0, model["level_stdv"][r] * 0.5)
            )
    return np.array(means, dtype=np.float32)


def test_abea_matches_oracle(model):
    rng = np.random.default_rng(0)
    for t in range(5):
        seq = "".join(rng.choice(list("ACGT"), int(rng.integers(60, 180))))
        ev = _synth(rng, model, seq)
        want = AO.align(seq, ev, model, 1.0, 0.0)
        got = A.align_events(seq, ev, model, 1.0, 0.0)
        assert got == want, t
        assert want, "synthetic alignments should pass QC"


def test_abea_alignment_sane(model):
    """Aligned pairs must be monotone and span the sequence."""
    rng = np.random.default_rng(3)
    seq = "".join(rng.choice(list("ACGT"), 120))
    ev = _synth(rng, model, seq)
    aln = A.align_events(seq, ev, model, 1.0, 0.0)
    assert aln[0][0] == 0 and aln[-1][0] == len(seq) - 6
    ks = [a[0] for a in aln]
    es = [a[1] for a in aln]
    assert all(b - a in (0, 1) for a, b in zip(ks, ks[1:]))
    assert all(b - a in (0, 1) for a, b in zip(es, es[1:]))


def test_abea_qc_failure(model):
    """Random events that don't match the sequence should be QC-dropped."""
    rng = np.random.default_rng(4)
    seq = "".join(rng.choice(list("ACGT"), 100))
    ev = rng.normal(0, 1, 150).astype(np.float32)  # garbage far from model
    got = A.align_events(seq, ev, model, 1.0, 0.0)
    want = AO.align(seq, ev, model, 1.0, 0.0)
    assert got == want == []


def test_abea_pallas_wrapper_cpu_fallback(model):
    """align_events_batch on CPU uses the scan path (pallas is TPU-only)."""
    rng = np.random.default_rng(9)
    seq = "".join(rng.choice(list("ACGT"), 80))
    ev = _synth(rng, model, seq)
    got = A.align_events_batch([seq], [ev], model, [1.0], [0.0])
    want = [AO.align(seq, ev, model, 1.0, 0.0)]
    assert got == want
