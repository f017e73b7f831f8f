"""GRM: device matmul path vs a direct numpy oracle + bed roundtrip."""

import numpy as np

from genomicsbench_palisade_tpu.io.plink import read_bed, write_bed
from genomicsbench_palisade_tpu.ops.grm import compute_grm, normalize_block_np


def _grm_oracle(geno):
    """Direct per-pair GCTA GRM with missing exclusion (float64)."""
    m, n = geno.shape
    miss = geno == 3
    g = geno.astype(np.float64)
    g[miss] = np.nan
    freqs = np.nanmean(g, axis=1) / 2.0
    var = 2 * freqs * (1 - freqs)
    grm = np.zeros((n, n))
    cnt = np.zeros((n, n))
    for i in range(m):
        if not var[i] > 2**-44:
            continue
        z = (g[i] - 2 * freqs[i]) / np.sqrt(var[i])
        ok = ~np.isnan(z)
        zz = np.where(ok, z, 0.0)
        grm += np.outer(zz, zz)
        cnt += np.outer(ok, ok)
    return grm / np.maximum(cnt, 1), cnt


def test_grm_matches_oracle():
    rng = np.random.default_rng(0)
    m, n = 300, 40
    geno = rng.choice([0, 1, 2], size=(m, n), p=[0.5, 0.3, 0.2]).astype(np.int8)
    geno[rng.random((m, n)) < 0.05] = 3  # missing
    geno[5] = 1  # all-het (degenerate variance check not triggered; var>0)
    geno[6] = 0  # monomorphic -> zero variance -> excluded
    got, got_cnt = compute_grm(geno, block=128)
    want, want_cnt = _grm_oracle(geno)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_bed_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    geno = rng.integers(0, 4, size=(20, 11)).astype(np.int8)
    prefix = str(tmp_path / "toy")
    write_bed(prefix, geno)
    got, fam, bim = read_bed(prefix)
    np.testing.assert_array_equal(got, geno)
    assert len(fam) == 11 and len(bim) == 20
