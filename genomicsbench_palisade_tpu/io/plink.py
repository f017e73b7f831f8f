"""Minimal plink .bed/.bim/.fam reader (GRM input path).

.bed format: magic 0x6c 0x1b, mode 0x01 (variant-major), then per variant
ceil(N/4) bytes, 2 bits per sample: 00=hom A1 (ALT dosage 2 under default
A1=minor coding... plink2 counts ALT dosage; we decode to the conventional
0/1/2 ALT-allele dosage with 10=missing semantics):
    00 -> 2 (hom minor/A1)   01 -> missing   10 -> 1 (het)   11 -> 0
"""

from __future__ import annotations

import numpy as np

_DECODE = np.zeros((256, 4), dtype=np.int8)
for byte in range(256):
    for k in range(4):
        two = (byte >> (2 * k)) & 3
        _DECODE[byte, k] = {0: 2, 1: 3, 2: 1, 3: 0}[two]  # 3 = missing


def read_bed(prefix: str):
    """Returns (geno [M, N] int8 with 3=missing, sample_ids, variant_ids)."""
    fam = []
    with open(prefix + ".fam") as f:
        for line in f:
            parts = line.split()
            if parts:
                fam.append(parts[0] + "\t" + parts[1])
    bim = []
    with open(prefix + ".bim") as f:
        for line in f:
            parts = line.split()
            if parts:
                bim.append(parts[1])
    n = len(fam)
    m = len(bim)
    bytes_per_variant = (n + 3) // 4
    with open(prefix + ".bed", "rb") as f:
        magic = f.read(3)
        assert magic[:2] == b"\x6c\x1b", "not a .bed file"
        assert magic[2] == 1, "only variant-major .bed supported"
        raw = np.frombuffer(f.read(), dtype=np.uint8)
    raw = raw.reshape(m, bytes_per_variant)
    geno = _DECODE[raw].reshape(m, bytes_per_variant * 4)[:, :n]
    return geno.copy(), fam, bim


def write_bed(prefix: str, geno: np.ndarray, sample_ids=None, variant_ids=None):
    """Inverse of read_bed (for tests/fixtures)."""
    m, n = geno.shape
    enc_map = {2: 0, 3: 1, 1: 2, 0: 3}
    bytes_per_variant = (n + 3) // 4
    out = np.zeros((m, bytes_per_variant), dtype=np.uint8)
    for i in range(m):
        for j in range(n):
            out[i, j // 4] |= enc_map[int(geno[i, j])] << (2 * (j % 4))
    with open(prefix + ".bed", "wb") as f:
        f.write(b"\x6c\x1b\x01")
        out.tofile(f)
    with open(prefix + ".fam", "w") as f:
        for j in range(n):
            sid = sample_ids[j] if sample_ids else f"F{j}\tI{j}"
            f.write(sid.replace("\t", " ") + " 0 0 0 -9\n")
    with open(prefix + ".bim", "w") as f:
        for i in range(m):
            vid = variant_ids[i] if variant_ids else f"snp{i}"
            f.write(f"1 {vid} 0 {i + 1} A C\n")
