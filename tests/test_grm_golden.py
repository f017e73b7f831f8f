"""plink2-binary golden parity for the GRM pipeline on .pgen input.

Fixtures in fixtures/grm_golden.json were produced by a plink2 binary
built from benchmarks/grm/2.0 (see tests/generate_fixtures.py gen_grm):
for each case, plink2 converted a .bed written by io/plink.py into
.pgen/.pvar/.psam, then ran the reference command
`--maf 0.01 --pgen ... --make-grm-bin` (scripts/run-cpu.sh:53).

Asserts: our pgen decoder reproduces the genotype matrix exactly; the
--maf filter removes the same variant count; .grm.N.bin matches exactly
and .grm.bin within plink2's 2e-5 single-precision contract.
"""

import base64
import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.io.plink import read_pgen
from genomicsbench_palisade_tpu.ops.grm import compute_grm, maf_filter

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "grm_golden.json") as f:
        return json.load(f)["cases"]


def _decode_case(case, tmp_path):
    pgen = tmp_path / "case.pgen"
    pgen.write_bytes(base64.b64decode(case["pgen"]))
    pvar = tmp_path / "case.pvar"
    pvar.write_text(case["pvar"])
    psam = tmp_path / "case.psam"
    psam.write_text(case["psam"])
    return read_pgen(str(pgen), str(pvar), str(psam))


def test_pgen_decoder_matches_genotypes(golden, tmp_path):
    for ci, case in enumerate(golden):
        want = np.array(case["geno"], np.int8)
        geno, sample_ids, variant_ids = _decode_case(case, tmp_path)
        assert geno.shape == want.shape, f"case {ci} shape"
        np.testing.assert_array_equal(geno, want, err_msg=f"case {ci}")
        assert len(sample_ids) == want.shape[1]
        assert len(variant_ids) == want.shape[0]


def test_grm_matches_plink2(golden, tmp_path):
    for ci, case in enumerate(golden):
        geno, sample_ids, _ = _decode_case(case, tmp_path)
        kept = maf_filter(geno, case["maf"])
        assert len(geno) - int(kept.sum()) == case["removed"], (
            f"case {ci}: --maf removed count mismatch")
        grm, counts = compute_grm(geno[kept])
        n = geno.shape[1]
        tril = np.tril_indices(n)
        got_grm = grm[tril[0], tril[1]]
        got_n = counts[tril[0], tril[1]]
        np.testing.assert_array_equal(
            got_n, np.array(case["n_bin"], np.float32),
            err_msg=f"case {ci}: N.bin")
        want_grm = np.array(case["grm_bin"], np.float32)
        np.testing.assert_allclose(got_grm, want_grm, atol=2e-5, rtol=2e-5,
                                   err_msg=f"case {ci}: grm.bin")
