"""Test configuration: run JAX on a virtual 8-device CPU mesh with fp64.

Mirrors the reference test strategy (SURVEY.md §4): numerics tests run in
float64 on CPU; sharded tests use the virtual device mesh in place of
`mpiexec -n N`. An opt-in hardware lane
(``PDE_TPU_TEST_PLATFORM=tpu python -m pytest -m tpu``) runs the
``@pytest.mark.tpu`` tests on the real chip in f32 — kernel-vs-XLA parity
and the fused gating contract on actual Mosaic lowerings, which interpret
mode cannot validate (it has missed real geometry bugs before).
"""

import os

# force CPU for numerics tests (fp64); set PDE_TPU_TEST_PLATFORM to override.
# NOTE: jax may already be imported at interpreter startup (sitecustomize), so
# the environment variable alone is not sufficient — use jax.config as well.
_platform = os.environ.get("PDE_TPU_TEST_PLATFORM", "cpu")
if _platform != "tpu":
    os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _platform != "tpu":
    jax.config.update("jax_platforms", _platform)
    # fp64 numerics oracles on CPU; the TPU lane stays in native f32
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: hardware lane (real chip; skipped on CPU CI)"
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast curated lane (`pytest -m smoke`, <5 min) — one cheap "
        "module per subsystem; the FULL suite plus the tpu lane remain the "
        "round-end gate",
    )


# fast lane: one representative (cheap) module per subsystem. Keep the
# combined `pytest -m smoke` runtime under ~5 minutes — it exists so quick
# iterations have a meaningful gate between full-suite runs, not instead
# of them.
_SMOKE_MODULES = {
    "tests/grids/test_grids.py",
    "tests/grids/test_boundaries.py",
    "tests/fields/test_fields.py",
    "tests/models/test_pdes.py",
    "tests/models/test_expression_pde.py",
    "tests/ops/test_cartesian_ops.py",
    "tests/ops/test_pallas_vector.py",
    "tests/solvers/test_solvers.py",
    "tests/storage/test_storage.py",
    "tests/trackers/test_trackers.py",
    "tests/utils/test_utils.py",
    "tests/visualization/test_visualization.py",
    "tests/test_backends.py",
    "tests/test_docs_audit.py",
}


def pytest_collection_modifyitems(config, items):
    on_tpu = _platform == "tpu"
    skip_tpu = pytest.mark.skip(
        reason="hardware lane: run with PDE_TPU_TEST_PLATFORM=tpu -m tpu"
    )
    skip_cpu = pytest.mark.skip(
        reason="CPU-oracle test: not run on the hardware lane"
    )
    rootdir = str(config.rootpath)
    for item in items:
        has_tpu_mark = "tpu" in item.keywords
        if has_tpu_mark and not on_tpu:
            item.add_marker(skip_tpu)
        elif not has_tpu_mark and on_tpu:
            item.add_marker(skip_cpu)
        rel = os.path.relpath(str(item.fspath), rootdir).replace(os.sep, "/")
        if rel in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _raise_numpy_errors():
    old_settings = np.seterr(all="raise", under="ignore")
    yield
    np.seterr(**old_settings)
