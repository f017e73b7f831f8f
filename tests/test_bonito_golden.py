"""Reference torch-model round-trip for the bonito basecaller network.

fixtures/bonito_golden.npz holds log-softmax outputs computed by the
REFERENCE'S OWN torch Model (benchmarks/nn-base/bonito/basecall.py
classes, built from its shipped config.toml) under a deterministic
weight recipe.  The test regenerates the identical state_dict arrays
from the recorded (name, shape) order, runs them through our torch->flax
converter and forward pass, and compares the logits — the converted-
weights validation the round-1 review called out as missing.
"""

import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.models import bonito as BM

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def test_bonito_converted_weights_match_reference_torch():
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from generate_fixtures import _bonito_weight_arrays

    data = np.load(FIXTURES / "bonito_golden.npz")
    names_shapes = json.loads(str(data["names"]))
    arrays = _bonito_weight_arrays(names_shapes)

    params = BM.load_torch_state_dict(arrays)
    model = BM.BonitoModel(blocks=tuple(BM.DNA_R941_BLOCKS))
    x = np.transpose(data["input"], (0, 2, 1))  # torch [B,1,T] -> [B,T,1]
    got = np.asarray(model.apply(params, x))
    want = data["logits"]
    assert got.shape == want.shape, (got.shape, want.shape)
    # f32 conv stacks on different backends: per-element tolerance; the
    # summed log-probabilities over the alphabet must also stay normalized
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, atol=1e-5)
