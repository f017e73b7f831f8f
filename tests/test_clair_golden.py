"""Clair TF1-checkpoint conversion round-trip.

The reference Clair is TF1 + tf.contrib (CudnnCompatibleLSTMCell), which
cannot execute under the installed TF2 — the golden outputs in
fixtures/clair_golden.npz therefore come from a cited numpy
transcription of the graph semantics (tests/generate_fixtures.py
gen_clair, sources model.py:266-330,423-640 and clair/selu.py).  The
test regenerates the TF-named variable map, converts it with
models.clair.load_tf_variables, and compares our flax forward's four
softmax heads against the transcription.
"""

import pathlib
import sys

import numpy as np
import pytest

from genomicsbench_palisade_tpu.models import clair as CM

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def test_clair_converted_weights_match_reference_semantics():
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from generate_fixtures import _clair_variables

    data = np.load(FIXTURES / "clair_golden.npz")
    params = CM.load_tf_variables(_clair_variables())
    model = CM.ClairModel()
    got = model.apply(params, data["input"])
    for name, head in zip(("gt21", "genotype", "indel1", "indel2"), got):
        want = data[name]
        got_np = np.asarray(head)
        assert got_np.shape == want.shape
        np.testing.assert_allclose(got_np, want, atol=2e-5, rtol=1e-4,
                                   err_msg=name)
        np.testing.assert_allclose(got_np.sum(-1), 1.0, atol=1e-5)
