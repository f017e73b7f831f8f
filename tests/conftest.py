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


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
