"""Tests for the backend compatibility facade and spectral operators."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.backends import XLABackend, get_backend


def test_get_backend_names():
    backend = get_backend("auto")
    assert isinstance(backend, XLABackend)
    for name in ["jax", "numba", "numpy", "torch", "numba_mpi", "scipy", "torch:cuda"]:
        assert isinstance(get_backend(name), XLABackend)
    with pytest.raises(KeyError):
        get_backend("not_a_backend")
    assert get_backend(backend) is backend


def test_backend_facade(rng):
    backend = get_backend("jax")
    grid = pde.UnitGrid([8, 8], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    # data movement
    native = backend.numpy_to_native(np.ones(3))
    assert backend.native_to_numpy(native).sum() == 3
    # operator factory
    lap = backend.make_operator(grid, "laplace", bc="periodic")
    np.testing.assert_allclose(
        np.asarray(lap(field.data)), np.asarray(field.laplace("periodic").data)
    )
    # integrator
    integrate = backend.make_integrator(grid)
    assert float(integrate(field.data)) == pytest.approx(float(field.integral))
    # rhs factory
    eq = pde.DiffusionPDE()
    rhs = backend.make_pde_rhs(eq, field)
    (rate,) = rhs([field.data], 0.0)
    np.testing.assert_allclose(
        np.asarray(rate), np.asarray(eq.evolution_rate(field).data)
    )
    # noise generator
    noise = backend.make_gaussian_noise(field, rng=1)
    sample = np.asarray(noise())
    assert sample.shape == (8, 8)
    assert not np.allclose(sample, np.asarray(noise()))


def test_spectral_laplace():
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 32, periodic=True)
    f = pde.ScalarField.from_expression(grid, "sin(x) * cos(2*y)")
    lap = f.laplace("periodic", spectral=True)
    np.testing.assert_allclose(
        np.asarray(lap.data), -5 * np.asarray(f.data), atol=1e-10
    )
    # spectral requires periodicity
    with pytest.raises(ValueError):
        pde.ScalarField(pde.UnitGrid([8, 8])).laplace(
            {"derivative": 0}, spectral=True
        )


def test_bc_sparse_matrix_data():
    """Virtual point data for building implicit matrices (reference local.py:1545)."""
    grid = pde.UnitGrid([4])
    bcs = grid.get_boundary_conditions({"x-": {"value": 2}, "x+": {"derivative": 1}})
    const, factors = bcs["x-"].get_sparse_matrix_data((0,))
    assert const == pytest.approx(4.0)  # 2 * value
    assert factors == {0: -1.0}
    const, factors = bcs["x+"].get_sparse_matrix_data((3,))
    assert const == pytest.approx(1.0)  # dx * derivative
    assert factors == {3: 1.0}


def test_bc_get_virtual_point():
    grid = pde.UnitGrid([4])
    bcs = grid.get_boundary_conditions({"value": 2})
    data = np.array([1.0, 2.0, 3.0, 4.0])
    vp_low = bcs["x-"].get_virtual_point(data)
    assert float(vp_low) == pytest.approx(2 * 2 - 1.0)
    vp_high = bcs["x+"].get_virtual_point(data)
    assert float(vp_high) == pytest.approx(2 * 2 - 4.0)
