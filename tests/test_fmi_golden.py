"""Reference-binary golden parity for the FM-index SMEM pipeline.

Fixtures in fixtures/fmi_golden.json were produced by the reference
suite's own FMI_search (tools/bwa-mem2/src/FMI_search.cpp built with the
plaintext HE stub — see tools/golden/fmi_harness.cpp and
tests/generate_fixtures.py).  Every case asserts:

* index-build parity: ref_len / count[5] / sentinel + FNV-64 hashes of
  the cp_occ planes and compressed SA arrays vs the reference build
* search parity: exact per-batch phase counts and the full sorted SMEM
  dump (rid, m, n, k, l, s) from the reference driver's 3-phase loop
  (fmi.cpp:241-345); order compared on the qsort key (rid, m, -n),
  payload as an exact multiset (reference qsort is unstable in ties)
"""

import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.index.builder import build_arrays
from genomicsbench_palisade_tpu.ops import fmi_pipeline as FP

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
# one padded compile shape for all cases/batches
_B_PAD, _L_PAD = 32, 152


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "fmi_golden.json") as f:
        return json.load(f)["cases"]


def _fnv64(h, data: bytes) -> int:
    for byte in data:
        h ^= byte
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def _index_hashes(idx):
    blocks = idx.cp_count.shape[0]
    rec = np.zeros((blocks, 8), dtype=np.uint64)
    rec[:, :4] = idx.cp_count.astype(np.int64).view(np.uint64)
    rec[:, 4:] = (idx.one_hot_hi.astype(np.uint64) << np.uint64(32)) | \
        idx.one_hot_lo.astype(np.uint64)
    hcp = _fnv64(14695981039346656037, rec.tobytes())
    hsa = _fnv64(14695981039346656037, idx.sa_ms_byte.tobytes())
    hsa = _fnv64(hsa, idx.sa_ls_word.tobytes())
    return hcp, hsa


def _encode(reads):
    enc = np.full((_B_PAD, _L_PAD), 4, np.int32)
    rl = np.zeros(_B_PAD, np.int32)
    for i, r in enumerate(reads):
        enc[i, : len(r)] = [_CODE[c] for c in r]
        rl[i] = len(r)
    return enc, rl


def test_fmi_reference_golden(golden):
    for case in golden:
        genome = np.array([_CODE[c] for c in case["seq"]], np.uint8)
        arrays = build_arrays(genome, sa_compression=True)
        assert arrays.count.tolist() == case["count"], "count[] mismatch"
        assert int(arrays.sentinel_index) == case["sentinel_index"]
        hcp, hsa = _index_hashes(arrays)
        assert f"{hcp:016x}" == case["hash_cp"], "cp_occ plane hash mismatch"
        assert f"{hsa:016x}" == case["hash_sa"], "SA array hash mismatch"

        index = arrays.as_device_arrays()
        reads, batch = case["reads"], case["batch"]
        got_counts, got_smems = [], []
        for start in range(0, len(reads), batch):
            chunk = reads[start : start + batch]
            enc, rl = _encode(chunk)
            out, n1, n2, n3, ovf = FP.fmi_pipeline_batch(
                index, enc, rl, min_seed_len=case["min_seed_len"],
                rid_base=start)
            assert not ovf, "unexpected overflow on a golden case"
            got_counts.append([n1, n2, n3])
            got_smems.extend(
                zip(out["rid"], out["m"], out["n"], out["k"], out["l"],
                    out["s"]))
        assert got_counts == case["batch_counts"], "phase-count mismatch"
        want = [tuple(s) for s in case["smems"]]
        got = [tuple(int(x) for x in s) for s in got_smems]
        assert len(got) == case["total"]
        # qsort key order must match exactly; ties compared as multisets
        assert [g[:3] for g in got] == [w[:3] for w in want]
        assert sorted(got) == sorted(want), "SMEM payload mismatch"
