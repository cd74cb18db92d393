"""Operator correctness against scipy.ndimage convolution oracles.

Ports the reference's generic operator test pattern
(`/root/reference/tests/backends/generic/operators/test_cartesian_operators.py:56-63`):
random smooth (power-law-correlated) fields, compared against independent
scipy implementations in fp64.
"""

import numpy as np
import pytest
from scipy import ndimage

import pde_tpu as pde


def _smooth_field(grid, rng):
    """Random field with power-law-correlated smoothness."""
    return pde.ScalarField.random_colored(grid, exponent=-6, rng=rng)


def _scipy_laplace(data, dx, periodic):
    mode = "wrap" if periodic else "reflect"  # reflect == zero-flux ghost
    res = np.zeros_like(data)
    for axis in range(data.ndim):
        kernel = np.array([1.0, -2.0, 1.0]) / dx[axis] ** 2
        res += ndimage.convolve1d(data, kernel, axis=axis, mode=mode)
    return res


def _scipy_gradient(data, dx, periodic):
    mode = "wrap" if periodic else "reflect"
    comps = []
    for axis in range(data.ndim):
        kernel = np.array([1.0, 0.0, -1.0]) / (2 * dx[axis])
        comps.append(ndimage.convolve1d(data, kernel, axis=axis, mode=mode))
    return np.array(comps)


@pytest.mark.parametrize("ndim", [1, 2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_laplace_vs_scipy(ndim, periodic, rng):
    shape = [12, 8, 6][:ndim]
    bounds = [(0, 2), (0, 1), (0, 3)][:ndim]
    grid = pde.CartesianGrid(bounds, shape, periodic=periodic)
    field = _smooth_field(grid, rng)
    bc = "periodic" if periodic else {"derivative": 0}
    res = field.laplace(bc)
    expected = _scipy_laplace(
        np.asarray(field.data), grid.discretization, periodic
    )
    np.testing.assert_allclose(np.asarray(res.data), expected, rtol=1e-10,
                               atol=1e-10)


@pytest.mark.parametrize("ndim", [1, 2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_gradient_vs_scipy(ndim, periodic, rng):
    shape = [12, 8, 6][:ndim]
    grid = pde.CartesianGrid([(0, 1)] * ndim, shape, periodic=periodic)
    field = _smooth_field(grid, rng)
    bc = "periodic" if periodic else {"derivative": 0}
    res = field.gradient(bc)
    expected = _scipy_gradient(
        np.asarray(field.data), grid.discretization, periodic
    )
    np.testing.assert_allclose(np.asarray(res.data), expected, rtol=1e-10,
                               atol=1e-10)


@pytest.mark.parametrize("periodic", [True, False])
def test_divergence_vs_scipy(periodic, rng):
    grid = pde.CartesianGrid([(0, 2), (0, 1)], (12, 10), periodic=periodic)
    field = pde.VectorField.random_uniform(grid, rng=rng)
    bc = "periodic" if periodic else {"derivative": 0}
    res = field.divergence(bc)
    data = np.asarray(field.data)
    mode = "wrap" if periodic else "reflect"
    expected = np.zeros(grid.shape)
    for axis in range(2):
        kernel = np.array([1.0, 0.0, -1.0]) / (2 * grid.discretization[axis])
        expected += ndimage.convolve1d(data[axis], kernel, axis=axis, mode=mode)
    np.testing.assert_allclose(np.asarray(res.data), expected, rtol=1e-10,
                               atol=1e-10)


@pytest.mark.parametrize("periodic", [True, False])
def test_laplace_anisotropic_discretization(periodic, rng):
    """Non-uniform dx per axis (reference `test_laplace_2d_nonuniform`)."""
    grid = pde.CartesianGrid([(0, 3.3), (0, 0.7)], (12, 8), periodic=periodic)
    a = rng.random(grid.shape)
    field = pde.ScalarField(grid, data=a)
    bc = "periodic" if periodic else {"derivative": 0}
    res = field.laplace(bc)
    expected = _scipy_laplace(a, grid.discretization, periodic)
    np.testing.assert_allclose(np.asarray(res.data), expected, rtol=1e-10,
                               atol=1e-10)


@pytest.mark.parametrize("periodic", [True, False])
def test_singular_dimensions(periodic, rng):
    """Grids with singleton axes reproduce the 1d result (reference
    `test_singular_dimensions_2d`)."""
    dim = int(rng.integers(3, 5))
    g1 = pde.UnitGrid([dim], periodic=periodic)
    field = pde.ScalarField.random_uniform(g1, rng=rng)
    expected = np.asarray(field.laplace("auto_periodic_neumann").data)
    for shape in ([dim, 1], [1, dim]):
        g = pde.UnitGrid(shape, periodic=periodic)
        f = pde.ScalarField(g, data=np.asarray(field.data).reshape(g.shape))
        res = np.asarray(f.laplace("auto_periodic_neumann").data).reshape(dim)
        np.testing.assert_allclose(res, expected, atol=1e-12)


def test_gradient_specific_bcs():
    """Pinned gradient values at boundaries (reference `test_gradient_1d`)."""
    grid = pde.UnitGrid([5])
    field = pde.ScalarField(grid, data=np.arange(5, dtype=float))
    res = field.gradient({"x-": {"derivative": -1}, "x+": {"derivative": 1}})
    np.testing.assert_allclose(np.asarray(res.data), np.ones((1, 5)))
    field = pde.ScalarField(grid, data=np.full(5, 3.0))
    res = field.gradient({"x": {"value": 3}})
    np.testing.assert_allclose(np.asarray(res.data), np.zeros((1, 5)),
                               atol=1e-12)


@pytest.mark.parametrize("op", ["laplace", "gradient", "gradient_squared"])
def test_operators_on_expression_fields(op, rng):
    """Discrete operators converge to analytic values on smooth fields."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 64, periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x) * cos(y)")
    result = field.apply_operator(op, bc="periodic")
    if op == "laplace":
        exact = pde.ScalarField.from_expression(grid, "-2 * sin(x) * cos(y)")
        np.testing.assert_allclose(np.asarray(result.data),
                                   np.asarray(exact.data), atol=0.02)
    elif op == "gradient":
        exact = pde.VectorField.from_expression(
            grid, ["cos(x) * cos(y)", "-sin(x) * sin(y)"]
        )
        np.testing.assert_allclose(np.asarray(result.data),
                                   np.asarray(exact.data), atol=0.02)
    else:
        exact = pde.ScalarField.from_expression(
            grid, "(cos(x) * cos(y))**2 + (sin(x) * sin(y))**2"
        )
        np.testing.assert_allclose(np.asarray(result.data),
                                   np.asarray(exact.data), atol=0.05)


@pytest.mark.parametrize("ndim", [1, 2])
def test_vector_laplace_and_gradient(ndim, rng):
    grid = pde.UnitGrid([8] * ndim, periodic=True)
    vf = pde.VectorField.random_uniform(grid, rng=rng)
    lap = vf.laplace("periodic")
    assert lap.data.shape == vf.data.shape
    # componentwise equality with scalar laplace
    for i in range(grid.dim):
        comp = pde.ScalarField(grid, data=np.asarray(vf.data)[i])
        np.testing.assert_allclose(
            np.asarray(lap.data)[i],
            np.asarray(comp.laplace("periodic").data),
            atol=1e-12,
        )
    grad = vf.gradient("periodic")
    assert grad.data.shape == (grid.dim, grid.dim) + tuple(grid.shape)


def test_tensor_divergence_consistency(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    tf = pde.Tensor2Field.random_uniform(grid, rng=rng)
    div = tf.divergence("periodic")
    assert div.data.shape == (2, 8, 8)
    # row-wise: divergence of each row vector
    for i in range(2):
        row = pde.VectorField(grid, data=np.asarray(tf.data)[i])
        np.testing.assert_allclose(
            np.asarray(div.data)[i],
            np.asarray(row.divergence("periodic").data),
            atol=1e-12,
        )


@pytest.mark.parametrize("periodic", [False, True])
def test_singular_dimension_2d(periodic, rng):
    """A 2D grid with a single cell along one axis reduces to the 1D result
    (reference `test_cartesian_operators.py:39`)."""
    grid2 = pde.UnitGrid([1, 16], periodic=periodic)
    field2 = pde.ScalarField.random_uniform(grid2, rng=rng)
    lap2 = field2.laplace("auto_periodic_neumann")

    grid1 = pde.UnitGrid([16], periodic=periodic)
    field1 = pde.ScalarField(grid1, field2.to_numpy()[0])
    lap1 = field1.laplace("auto_periodic_neumann")
    np.testing.assert_allclose(lap2.to_numpy()[0], lap1.to_numpy(), atol=1e-12)
