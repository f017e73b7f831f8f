"""Native C++ parser vs the pure-Python reader (when built)."""

import gzip

import numpy as np
import pytest

from genomicsbench_palisade_tpu.io.fastq import read_all
from genomicsbench_palisade_tpu.io.native import available, parse_reads_native
from genomicsbench_palisade_tpu.ops.oracle.fmi import encode_read


@pytest.mark.skipif(not available(), reason="native library not built")
def test_native_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    reads = ["".join(rng.choice(list("ACGTN"), int(rng.integers(50, 200)))) for _ in range(30)]
    fq = tmp_path / "t.fq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    gz = tmp_path / "t.fq.gz"
    with gzip.open(gz, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    for path in (fq, gz):
        codes, quals, offsets, lengths = parse_reads_native(str(path))
        pyreads = read_all(str(path))
        assert len(lengths) == len(pyreads) == len(reads)
        for i, (name, seq, qual) in enumerate(pyreads):
            got = codes[offsets[i] : offsets[i] + lengths[i]]
            np.testing.assert_array_equal(got, encode_read(seq).astype(np.int8))
        assert quals is not None and (quals == ord("I") - 33).all()
