"""NN models: shapes, CTC decode, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomicsbench_palisade_tpu.models import bonito as BM
from genomicsbench_palisade_tpu.models import clair as CM


@pytest.fixture(scope="module")
def tiny_bonito():
    # scaled-down block stack (same structure) to keep tests fast
    blocks = [
        (32, 1, 9, 3, False, False),
        (48, 2, 15, 1, True, True),
        (32, 1, 7, 1, False, True),
        (16, 1, 5, 1, False, False),
    ]
    return BM.init_model(chunk=512, blocks=blocks)


def test_bonito_forward_shapes(tiny_bonito):
    model, params = tiny_bonito
    x = jnp.zeros((2, 512, 1))
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 512 // 3 + (1 if 512 % 3 else 0), 5)
    # log_softmax rows sum to 1
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-5)


def test_bonito_ctc_decode():
    lp = np.full((6, 5), -10.0)
    # path: A A N C blank G  -> "ACG"
    for t, lab in enumerate([1, 1, 0, 2, 0, 3]):
        lp[t, lab] = 0.0
    assert BM.viterbi_decode(jnp.asarray(lp)) == "ACG"


def test_bonito_beam_search():
    lp = np.full((6, 5), -12.0)
    for t, lab in enumerate([1, 1, 0, 2, 0, 3]):
        lp[t, lab] = -0.01
    # peaked posteriors: beam == viterbi
    assert BM.beam_search_decode(lp) == BM.viterbi_decode(jnp.asarray(lp)) == "ACG"
    # the classic greedy failure: argmax path is blank-blank ("") but the
    # summed mass of label-1-containing paths wins -> beam returns "A"
    lp2 = np.log(np.array([[0.55, 0.45, 0, 0, 0]] * 2).clip(1e-12))
    assert BM.viterbi_decode(jnp.asarray(lp2)) == ""
    assert BM.beam_search_decode(lp2) == "A"


def test_bonito_basecall_runs(tiny_bonito):
    model, params = tiny_bonito
    rng = np.random.default_rng(0)
    seq = BM.basecall(model, params, rng.normal(0, 1, 1200).astype(np.float32), chunksize=512)
    assert isinstance(seq, str)


def test_clair_forward_shapes():
    model, params = CM.init_model()
    x = jnp.zeros((3, CM.POSITIONS, CM.MATRIX_ROW, CM.MATRIX_NUM))
    gt21, genotype, il1, il2 = jax.jit(model.apply)(params, x)
    assert gt21.shape == (3, 21)
    assert genotype.shape == (3, 3)
    assert il1.shape == (3, 33) and il2.shape == (3, 33)
    for head in (gt21, genotype, il1, il2):
        np.testing.assert_allclose(np.asarray(head).sum(-1), 1.0, rtol=1e-5)
