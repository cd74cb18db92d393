"""Elliptic solver depth: Poisson on all grid classes, manufactured solutions.

Reference: scipy-backend sparse Poisson (`/root/reference/pde/backends/scipy/
operators/cartesian.py:473`); here a matrix-free FFT/BiCGStab solver.
"""

import numpy as np
import pytest

import pde_tpu as pde


def test_poisson_manufactured_2d():
    """-∇²u = f with u = sin(πx)sin(πy), Dirichlet-0."""
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (32, 32))
    f = pde.ScalarField.from_expression(
        grid, "2 * pi**2 * sin(pi * x) * sin(pi * y)"
    )
    # solve_poisson_equation solves ∇²u = f
    u = pde.solve_poisson_equation(-f, bc={"value": 0})
    exact = pde.ScalarField.from_expression(grid, "sin(pi * x) * sin(pi * y)")
    np.testing.assert_allclose(np.asarray(u.data), np.asarray(exact.data),
                               atol=5e-3)


def test_poisson_periodic_zero_mean(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    f = pde.ScalarField.random_uniform(grid, rng=rng)
    f -= float(f.average)  # solvability condition
    u = pde.solve_poisson_equation(f, bc="periodic")
    residual = u.laplace("periodic") - f
    assert float(np.abs(np.asarray(residual.data)).max()) < 1e-6


def test_poisson_polar():
    grid = pde.PolarSymGrid(1, 32)
    f = pde.ScalarField(grid, data=1.0)
    u = pde.solve_poisson_equation(f, bc={"value": 0})
    # -> u(r) = (r²-1)/4 solves (1/r)(r u')' = 1 with u(1)=0
    exact = (np.asarray(grid.axes_coords[0]) ** 2 - 1) / 4
    np.testing.assert_allclose(np.asarray(u.data), exact, atol=2e-3)


def test_poisson_spherical():
    grid = pde.SphericalSymGrid(1, 32)
    f = pde.ScalarField(grid, data=1.0)
    u = pde.solve_poisson_equation(f, bc={"value": 0})
    exact = (np.asarray(grid.axes_coords[0]) ** 2 - 1) / 6
    np.testing.assert_allclose(np.asarray(u.data), exact, atol=2e-3)


def test_laplace_equation_harmonic():
    """The Laplace solution is harmonic: ∇²u ≈ 0 in the interior."""
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (24, 24))
    u = pde.solve_laplace_equation(grid, bc={"x": {"value": "y"},
                                             "y": {"value": "x"}})
    lap = u.laplace({"x": {"value": "y"}, "y": {"value": "x"}})
    interior = np.asarray(lap.data)[4:-4, 4:-4]
    assert np.abs(interior).max() < 1e-4


def test_helmholtz_decomposition(rng):
    from pde_tpu.models.laplace import helmholtz_decomposition

    grid = pde.UnitGrid([16, 16], periodic=True)
    vf = pde.VectorField.random_colored(grid, exponent=-4, rng=rng)
    potential, solenoidal = helmholtz_decomposition(vf, bc="periodic")
    # the reconstruction holds and the solenoidal part is divergence-free
    recon = potential.gradient("periodic") + solenoidal
    np.testing.assert_allclose(np.asarray(recon.data), np.asarray(vf.data),
                               atol=1e-8)
    df_div = solenoidal.divergence("periodic")
    assert np.abs(np.asarray(df_div.data)).max() < 1e-6
