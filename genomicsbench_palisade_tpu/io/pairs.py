"""Parser for the bsw pair-file format.

Format (benchmarks/bsw/main_banded.cpp:148-202 loadPairs): 3-line records
    <seed score h0>
    <reference string, ASCII-digit base codes ('0'..'4')>
    <query string>
Characters are decoded by subtracting 48 ('0').
"""

from __future__ import annotations

import numpy as np


def parse_pairs(path_or_file, max_pairs: int | None = None):
    """Returns list of (query_codes, target_codes, h0) numpy tuples."""
    if hasattr(path_or_file, "read"):
        lines = path_or_file.read().splitlines()
    else:
        with open(path_or_file) as f:
            lines = f.read().splitlines()
    out = []
    n = len(lines) // 3
    if max_pairs is not None:
        n = min(n, max_pairs)
    for i in range(n):
        h0 = int(lines[3 * i].split()[0])
        ref = np.frombuffer(lines[3 * i + 1].encode(), dtype=np.uint8) - 48
        qer = np.frombuffer(lines[3 * i + 2].encode(), dtype=np.uint8) - 48
        out.append((qer.astype(np.int8), ref.astype(np.int8), h0))
    return out
