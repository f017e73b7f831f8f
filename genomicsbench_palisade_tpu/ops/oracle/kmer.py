"""Canonical k-mer counting oracle (Flye KmerCounter semantics).

Semantics source: benchmarks/kmer-cnt/kmer.h:16-121 (2-bit packing,
reverseComplement via ~x&3, standardForm = min(kmer, revcomp)),
vertex_index.cpp:515-659 (4-bit saturating flat counter + hash spill),
sequence.h:161-193 (A=0 C=1 G=2 T=3; any other char maps to 3 via the
-1 table entry whose low 2 bits are set), kmer_cnt.cpp:220-231 (reads
shorter than max(minReadLength, minOverlap=5000) are dropped).

Parity quirks that must be reproduced:
  * IterKmers yields positions 0..len-k-1 — the k-mer at the final
    position len-k is NOT counted (kmer.h:177-200 end iterator).
  * only forward-strand records are iterated (readId.strand()), i.e.
    each input read contributes its own k-mers once; canonicalization
    covers the reverse complement.
Reported metrics: "Total k-mers" = number of distinct canonical k-mers
observed; "Hash size" = number of distinct k-mers whose occurrence count
exceeded the 4-bit saturation (count > 15).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

MIN_READ_LENGTH = 5000
DEFAULT_K = 17

_CODE = {"A": 0, "a": 0, "C": 1, "c": 1, "G": 2, "g": 2, "T": 3, "t": 3}


def encode_seq(s: str) -> np.ndarray:
    """2-bit codes; non-ACGT behaves as 3 (the -1 table entry's low bits)."""
    return np.array([_CODE.get(ch, 3) for ch in s], dtype=np.uint8)


def kmer_codes(seq_codes: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """Packed 2-bit k-mer codes at positions 0..len-k-1 (last one excluded)."""
    n = len(seq_codes) - k  # NOT n-k+1: reference excludes the final k-mer
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    codes = np.zeros(n, dtype=np.uint64)
    cur = 0
    for i in range(k):
        cur = (cur << 2) | int(seq_codes[i])
    mask = (1 << (2 * k)) - 1
    codes[0] = cur
    for p in range(1, n):
        cur = ((cur << 2) | int(seq_codes[p + k - 1])) & mask
        codes[p] = cur
    return codes


def revcomp_code(code: int, k: int = DEFAULT_K) -> int:
    out = 0
    for _ in range(k):
        out = (out << 2) | ((~code) & 3)
        code >>= 2
    return out


def canonical_codes(codes: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    out = np.empty_like(codes)
    for idx, c in enumerate(codes):
        rc = revcomp_code(int(c), k)
        out[idx] = min(int(c), rc)
    return out


def count_kmers(reads, k: int = DEFAULT_K, min_read_length: int = MIN_READ_LENGTH):
    """reads: iterable of DNA strings. Returns dict with parity metrics.

    Returns {"total_kmers": distinct canonical k-mers,
             "hash_size": distinct k-mers with count > 15,
             "counter": Counter of canonical code -> occurrences}
    """
    counter: Counter = Counter()
    for read in reads:
        if len(read) < min_read_length:
            continue
        codes = kmer_codes(encode_seq(read), k)
        for c in canonical_codes(codes, k):
            counter[int(c)] += 1
    total = len(counter)
    hash_size = sum(1 for v in counter.values() if v > 15)
    return {"total_kmers": total, "hash_size": hash_size, "counter": counter}
