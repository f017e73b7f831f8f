"""Multi-process jax.distributed bring-up (the fake multi-host backend).

Launches 2 OS processes x 2 virtual CPU devices via
tools/multiprocess_bench.py and asserts the production shard_map kernels
(phmm DP, kmer all_to_all+psum) produce bit-identical results over the
global 4-device mesh.  SURVEY.md §4.6 prescribes this as the multi-host
test strategy (the reference has no distributed backend at all).
"""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_two_process_distributed_parity(tmp_path):
    out = tmp_path / "multiproc.json"
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multiprocess_bench.py"),
         "--procs", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=1000, cwd=str(REPO))
    assert res.returncode == 0, res.stdout[-1500:] + res.stderr[-1500:]
    runs = json.loads(out.read_text())["runs"]
    assert runs[0]["ok"]
    assert runs[0]["global_devices"] == 4
    assert runs[0]["phmm_parity"] and runs[0]["kmer_parity"]
    # per-process shard-file index load (save_npz_sharded) + sharded search
    assert runs[0]["fmi_parity"]
