"""Test configuration: run JAX on a virtual 8-device CPU mesh with fp64.

Mirrors the reference test strategy (SURVEY.md §4): numerics tests run in
float64 on CPU; sharded tests use the virtual device mesh in place of
`mpiexec -n N`.
"""

import os

# force CPU for numerics tests (fp64); set PDE_TPU_TEST_PLATFORM to override.
# NOTE: jax may already be imported at interpreter startup (sitecustomize), so
# the environment variable alone is not sufficient — use jax.config as well.
_platform = os.environ.get("PDE_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _raise_numpy_errors():
    old_settings = np.seterr(all="raise", under="ignore")
    yield
    np.seterr(**old_settings)
