"""Tests for elliptic solvers (mirrors reference tests/pdes/test_laplace_pdes.py)."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.models.laplace import (
    helmholtz_decomposition,
    solve_laplace_equation,
    solve_poisson_equation,
)


def test_poisson_solver_1d():
    grid = pde.UnitGrid([4])
    res = solve_laplace_equation(grid, bc={"x-": {"value": -1}, "x+": {"value": 3}})
    np.testing.assert_allclose(np.asarray(res.data), grid.axes_coords[0] - 1, atol=1e-8)

    res = solve_laplace_equation(grid, bc={"x-": {"value": -1}, "x+": {"derivative": 1}})
    np.testing.assert_allclose(np.asarray(res.data), grid.axes_coords[0] - 1, atol=1e-8)

    grid2 = pde.CartesianGrid([[0, 1]], 4)
    field = pde.ScalarField(grid2, data=1)
    res = solve_poisson_equation(field, bc={"x-": {"value": 1}, "x+": {"derivative": 1}})
    xs = grid2.axes_coords[0]
    np.testing.assert_allclose(np.asarray(res.data), 1 + 0.5 * xs**2, rtol=1e-2)

    # inconsistent problem: non-neutral rhs with pure Neumann conditions
    with pytest.raises(RuntimeError, match="Neumann"):
        solve_poisson_equation(field, {"derivative": 0})


def test_poisson_solver_2d_dirichlet():
    grid = pde.CartesianGrid([[0, 2 * np.pi]] * 2, 16)
    bcs = {"x": {"value": "sin(y)"}, "y": {"value": "sin(x)"}}
    res = solve_laplace_equation(grid, bcs)
    xs, ys = grid.coordinate_arrays
    expect = (
        np.cosh(np.pi - ys) * np.sin(xs) + np.cosh(np.pi - xs) * np.sin(ys)
    ) / np.cosh(np.pi)
    np.testing.assert_allclose(np.asarray(res.data), expect, atol=1e-2, rtol=1e-2)


def test_poisson_fft_periodic():
    """The FFT path solves the DISCRETE periodic Poisson problem exactly."""
    grid = pde.CartesianGrid([[0, 2 * np.pi]] * 2, 32, periodic=True)
    f = pde.ScalarField.from_expression(grid, "sin(x) * cos(2*y)")
    u = solve_poisson_equation(f, "periodic")
    residual = u.laplace("periodic") - f
    assert float(abs(residual.data).max()) < 1e-10
    assert abs(float(u.average)) < 1e-10  # zero-mean convention


def test_poisson_spherical():
    grid = pde.SphericalSymGrid(2, 32)
    f = pde.ScalarField(grid, 6.0)
    u = solve_poisson_equation(f, {"r-": {"derivative": 0}, "r+": {"value": 4.0}})
    np.testing.assert_allclose(
        np.asarray(u.data), grid.axes_coords[0] ** 2, atol=1e-2
    )


def test_helmholtz_decomposition():
    grid = pde.CartesianGrid([[0, 2 * np.pi]], 32, periodic=True)
    field = pde.VectorField.from_expression(grid, ["sin(x)"])
    phi, vec = helmholtz_decomposition(field, bc="auto_periodic_neumann")
    phi_grad = phi.gradient("auto_periodic_neumann")
    np.testing.assert_allclose(
        np.asarray(field.data), np.asarray(phi_grad.data), atol=1e-2, rtol=1e-2
    )
    np.testing.assert_allclose(np.asarray(vec.data), 0, atol=1e-2)
