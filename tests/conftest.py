"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code
paths are exercised on a virtual CPU mesh exactly as the driver's
dryrun_multichip does.  Must run before jax is imported anywhere.
"""

import os

# Tests run on a virtual CPU mesh.  The axon TPU plugin registers itself in
# sitecustomize at interpreter start and blocks jax backend init even under
# JAX_PLATFORMS=cpu, so drop its backend factory before any backend is
# initialized (conftest imports run before test modules import jax "for real").
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    import jax
    import jax._src.xla_bridge as _xb

    # sitecustomize imports jax before this conftest, so the env var alone
    # is too late — update the live config too.
    jax.config.update("jax_platforms", "cpu")
    # pop only the axon plugin; removing "tpu" breaks pallas-tpu lowering
    # registration (it must remain a *known* platform even when unused)
    _xb._backend_factories.pop("axon", None)
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

# ---------------------------------------------------------------------------
# slow-test split: `pytest -m "not slow"` is the ~5-minute core loop on a
# 1-core VM; the full suite (~40 min, dominated by interpret-mode Pallas
# and dataset-scale cases) stays the CI gate.  Centralised here instead of
# per-file decorators so the core-loop budget is auditable in one place.
# Every component family keeps at least one unmarked test (fmi via
# test_fmi_jax small cases, poa via test_poa small cases, phmm via the
# fixture suites, abea via eventalign[16] + CLI tests, ...).
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    "test_fmi_golden.py::test_fmi_reference_golden",
    "test_poa_golden.py::test_poa_device_matches_reference",
    "test_poa_golden.py::test_poa_oracle_matches_reference",
    "test_multiprocess.py::test_two_process_distributed_parity",
    "test_phmm_pallas.py::test_pallas_512_hap_bucket_matches_scan",
    "test_parallel.py::test_chain_halo_sharded_matches_single",
    "test_parallel.py::test_kmer_sharded_matches_oracle",
    "test_parallel.py::test_fmi_pipeline_index_sharded",
    "test_parallel.py::test_sharded_index_files_roundtrip_and_search",
    "test_parallel.py::test_fmi_sharded_index_search",
    "test_parallel.py::test_profiling_roi",
    "test_parallel.py::test_scaling_harness_runs",
    "test_models.py::test_clair_forward_shapes",
    "test_abea.py::test_abea_pallas_interpret_matches_oracle",
    "test_abea.py::test_abea_pallas_chunked_matches_single_chunk",
    "test_poa_swov_golden.py::test_swov_device_matches_reference",
    "test_scale_tools.py::test_abea_scale_smoke",
    "test_scale_tools.py::test_poa_scale_smoke",
    "test_scale_tools.py::test_kmer_scale_smoke",
    "test_abea_golden.py::test_abea_oracle_matches_reference",
    "test_poa.py::test_jax_alignment_matches_oracle",
    "test_poa.py::test_jax_consensus_end_to_end",
    "test_poa.py::test_native_graph_full_run_matches_python",
    "test_kmer_golden.py::test_kmer_device_matches_reference",
    "test_fmi_jax.py::test_full_pipeline_matches_oracle",
    "test_fmi_jax.py::test_fmi_cli_host_engine_matches_tpu",
    "test_nn_cli.py::test_call_var_cli_reference_flags",
    "test_nn_cli.py::test_call_var_cli",
    "test_nn_cli.py::test_call_var_cli_h5",
    "test_nn_cli.py::test_basecall_cli",
}

# parametrized cases marked individually (one representative stays fast)
SLOW_NODEIDS = {
    f"test_eventalign.py::test_eventalign_golden[{ci}]"
    for ci in (17, 18, 20, 21, 24)
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        key = it.nodeid.rsplit("tests/", 1)[-1]
        if key.split("[", 1)[0] in SLOW_TESTS or key in SLOW_NODEIDS:
            it.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
