"""Cartesian operator tests against analytic and scipy oracles.

Mirrors reference tests/backends/generic/operators/test_cartesian_operators.py.
"""

import numpy as np
import pytest
from scipy import ndimage

import pde_tpu as pde


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_laplace_periodic_vs_scipy(ndim, rng):
    shape = (16,) * ndim
    grid = pde.UnitGrid(shape, periodic=True)
    field = pde.ScalarField.random_normal(grid, rng=rng, correlation="gaussian",
                                          length_scale=2)
    lap = field.laplace("periodic")
    weights = np.zeros((3,) * ndim)
    for ax in range(ndim):
        idx = [1] * ndim
        for off in (0, 2):
            idx[ax] = off
            weights[tuple(idx)] += 1.0
    weights[(1,) * ndim] = -2.0 * ndim
    expected = ndimage.convolve(np.asarray(field.data), weights, mode="wrap")
    np.testing.assert_allclose(np.asarray(lap.data), expected, atol=1e-12)


def test_laplace_analytic():
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 64, periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x) * cos(y)")
    lap = field.laplace("periodic")
    np.testing.assert_allclose(
        np.asarray(lap.data), -2 * np.asarray(field.data), atol=2e-3
    )


def test_gradient_analytic():
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 128, periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x)")
    grad = field.gradient("periodic")
    xs = grid.coordinate_arrays[0]
    np.testing.assert_allclose(np.asarray(grad.data[0]), np.cos(xs), atol=2e-3)
    np.testing.assert_allclose(np.asarray(grad.data[1]), 0, atol=1e-12)


def test_gradient_squared():
    grid = pde.CartesianGrid([(0, 2 * np.pi)], 256, periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x)")
    gs_central = field.gradient_squared("periodic", central=True)
    gs_forward = field.gradient_squared("periodic", central=False)
    xs = grid.axes_coords[0]
    np.testing.assert_allclose(np.asarray(gs_central.data), np.cos(xs) ** 2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gs_forward.data), np.cos(xs) ** 2, atol=1e-3)


def test_divergence_analytic():
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 128, periodic=True)
    field = pde.VectorField.from_expression(grid, ["cos(x)", "sin(y)"])
    div = field.divergence("periodic")
    xs, ys = grid.coordinate_arrays
    np.testing.assert_allclose(
        np.asarray(div.data), -np.sin(xs) + np.cos(ys), atol=2e-3
    )


def test_vector_gradient_and_laplace():
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 64, periodic=True)
    field = pde.VectorField.from_expression(grid, ["sin(y)", "cos(x)"])
    grad = field.gradient("periodic")
    assert grad.data.shape == (2, 2, 64, 64)
    xs, ys = grid.coordinate_arrays
    # out[i, j] = d_j v_i
    np.testing.assert_allclose(np.asarray(grad.data[0, 1]), np.cos(ys), atol=5e-3)
    np.testing.assert_allclose(np.asarray(grad.data[1, 0]), -np.sin(xs), atol=5e-3)
    lap = field.laplace("periodic")
    np.testing.assert_allclose(np.asarray(lap.data), -np.asarray(field.data), atol=5e-3)


def test_tensor_divergence():
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 64, periodic=True)
    vf = pde.VectorField.from_expression(grid, ["sin(y)", "cos(x)"])
    tf = vf.gradient("periodic")
    div = tf.divergence("periodic")
    # div(grad v)_i = laplace(v_i)
    lap = vf.laplace("periodic")
    np.testing.assert_allclose(np.asarray(div.data), np.asarray(lap.data), atol=5e-3)


def test_laplace_corner_weight():
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_normal(grid, rng=np.random.default_rng(0),
                                          correlation="gaussian", length_scale=3)
    lap5 = field.laplace("periodic", corner_weight=0.0)
    lap9 = field.laplace("periodic", corner_weight=1 / 3)
    # both approximate the same Laplacian on smooth fields
    assert float(abs(lap5.data - lap9.data).max()) < 0.5 * float(
        abs(lap5.data).max()
    )
    # 9-point stencil sums to zero -> constant fields map to zero
    const = pde.ScalarField(grid, 3.0)
    np.testing.assert_allclose(
        np.asarray(const.laplace("periodic", corner_weight=1 / 3).data), 0, atol=1e-12
    )


def test_laplace_corner_weight_transpose_symmetry():
    """9-pt corner ghosts must wrap identically for x- and y-periodic grids.

    Regression test: the reference's corner setter wraps two corners the
    wrong way in its periodic_y branch (`numba/operators/cartesian.py:64`),
    breaking the transpose symmetry; pde_tpu fixes this on purpose.
    """
    rng = np.random.default_rng(1)
    data = rng.normal(size=(6, 6))
    grid_x = pde.CartesianGrid([[0, 6], [0, 6]], (6, 6), periodic=[True, False])
    grid_y = pde.CartesianGrid([[0, 6], [0, 6]], (6, 6), periodic=[False, True])
    lap_x = pde.ScalarField(grid_x, data).laplace(
        "auto_periodic_neumann", corner_weight=0.5
    )
    lap_y = pde.ScalarField(grid_y, data.T.copy()).laplace(
        "auto_periodic_neumann", corner_weight=0.5
    )
    np.testing.assert_allclose(
        np.asarray(lap_x.data), np.asarray(lap_y.data).T, atol=1e-12
    )


def test_operators_neumann_dirichlet_consistency():
    # laplace of a linear profile with matching BCs vanishes
    grid = pde.CartesianGrid([(0, 1)], 32)
    field = pde.ScalarField.from_expression(grid, "2*x")
    bc = {"x-": {"value": 0}, "x+": {"value": 2}}
    np.testing.assert_allclose(np.asarray(field.laplace(bc).data), 0, atol=1e-10)
    bc2 = {"x-": {"derivative": -2}, "x+": {"derivative": 2}}
    np.testing.assert_allclose(np.asarray(field.laplace(bc2).data), 0, atol=1e-10)


def test_make_operator_no_bc():
    grid = pde.UnitGrid([4])
    op = grid.make_operator_no_bc("laplace")
    full = np.array([0.0, 1.0, 2.0, 4.0, 8.0, 16.0])
    out = np.asarray(op(full))
    np.testing.assert_allclose(out, [0.0, 1.0, 2.0, 4.0])


def test_operator_registry():
    ops = pde.CartesianGrid([(0, 1)], 4).operators()
    for name in ["laplace", "gradient", "divergence", "vector_gradient",
                 "vector_laplace", "tensor_divergence", "gradient_squared"]:
        assert name in ops
    with pytest.raises(NotImplementedError):
        pde.UnitGrid([4]).make_operator("unknown_op", bc="auto_periodic_neumann")


def test_derivative_helpers():
    from pde_tpu.ops import make_derivative, make_derivative2

    grid = pde.CartesianGrid([(0, 2 * np.pi)], 128, periodic=True)
    bcs = grid.get_boundary_conditions("periodic")
    xs = grid.axes_coords[0]
    data = np.sin(xs)
    d1 = make_derivative(grid, axis=0, bcs=bcs)
    np.testing.assert_allclose(np.asarray(d1(data)), np.cos(xs), atol=2e-3)
    d2 = make_derivative2(grid, axis=0, bcs=bcs)
    np.testing.assert_allclose(np.asarray(d2(data)), -np.sin(xs), atol=2e-3)
