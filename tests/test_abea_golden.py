"""Reference-binary golden parity for f5c adaptive banded event alignment.

Fixtures in fixtures/abea_golden.json come from the reference's own
events.c (getevents) + align.c (estimate_scalings_using_mom, align) built
from source — tools/golden/abea_harness.cpp.  Floats are stored as C %a
hexfloats for bit-exact comparison.  Asserts event tables, scalings, and
every aligned (ref_pos, read_pos) pair from the oracle pipeline, plus the
device kernel on a sample.
"""

import json
import pathlib

import numpy as np
import pytest

from genomicsbench_palisade_tpu.io import signal as SIG
from genomicsbench_palisade_tpu.ops.oracle import abea as AO
from genomicsbench_palisade_tpu.ops.oracle import events as EO

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES / "abea_golden.json") as f:
        return json.load(f)["cases"]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from generate_fixtures import _pore_levels

    levels = _pore_levels()
    path = tmp_path_factory.mktemp("abea") / "pore.tsv"
    with open(path, "w") as f:
        f.write("kmer\tlevel_mean\tlevel_stdv\n")
        for km, mean in levels.items():
            f.write(f"{km}\t{mean:.2f}\t1.50\n")
    return SIG.load_pore_model(str(path))


def test_abea_oracle_matches_reference(golden, model):
    for case in golden:
        sig = np.array([float(x) for x in case["signal"]], np.float32)
        ev = EO.detect_events(sig)
        want_means = np.array([float.fromhex(e[2]) for e in case["events"]],
                              np.float32)
        assert len(ev["mean"]) == len(case["events"]), "event count mismatch"
        np.testing.assert_array_equal(
            np.asarray(ev["mean"], np.float32), want_means)
        np.testing.assert_array_equal(
            np.asarray(ev["start"], np.int64),
            np.array([e[0] for e in case["events"]], np.int64))

        shift, scale = EO.estimate_scalings_using_mom(case["seq"], model, ev)
        assert np.float32(scale) == np.float32(float.fromhex(case["scale"]))
        assert np.float32(shift) == np.float32(float.fromhex(case["shift"]))

        pairs = AO.align(case["seq"], ev["mean"], model, scale, shift)
        want_pairs = [tuple(p) for p in case["pairs"]]
        assert [tuple(p) for p in pairs] == want_pairs, "aligned pairs differ"


def test_abea_device_matches_reference(golden, model):
    """Device scan kernel vs reference pairs on a subset (CPU-mesh sized)."""
    from genomicsbench_palisade_tpu.ops import abea as A

    for case in golden[:6]:
        sig = np.array([float(x) for x in case["signal"]], np.float32)
        ev = EO.detect_events(sig)
        shift, scale = EO.estimate_scalings_using_mom(case["seq"], model, ev)
        pairs = A.align_events(case["seq"], np.asarray(ev["mean"], np.float32),
                               model, scale, shift)
        assert [tuple(p) for p in pairs] == [tuple(p) for p in case["pairs"]]
