"""Solver matrix: every solver × state type × stepping mode.

Extends the reference's per-solver integration coverage
(`/root/reference/tests/solvers/test_generic_solvers.py`): convergence to the
exact decay solution, FieldCollection states, and cross-solver consistency.
"""

import numpy as np
import pytest

import pde_tpu as pde

FIXED_SOLVERS = ["euler", "runge-kutta", "adams-bashforth", "implicit",
                 "crank-nicolson"]


class DecayPDE(pde.PDEBase):
    """du/dt = -u with exact solution u0 * exp(-t)."""

    def evolution_rate(self, state, t=0):
        return -state


@pytest.mark.parametrize("solver", FIXED_SOLVERS)
def test_solver_converges_to_exact_decay(solver):
    grid = pde.UnitGrid([4])
    state = pde.ScalarField(grid, data=1.0)
    eq = DecayPDE()
    result = eq.solve(state, t_range=1.0, dt=1e-3, solver=solver, tracker=None)
    expected = np.exp(-1.0)
    order = {"euler": 2e-3, "adams-bashforth": 1e-5, "runge-kutta": 1e-9,
             "implicit": 2e-3, "crank-nicolson": 1e-5}[solver]
    np.testing.assert_allclose(
        np.asarray(result.data), expected, rtol=3 * order
    )


@pytest.mark.parametrize("solver", FIXED_SOLVERS)
def test_solver_field_collection_state(solver, rng):
    """Coupled 2-field states work in every deterministic solver."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.ScalarField.random_uniform(grid, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({"u": "0.1 * laplace(u) - 0.5 * v", "v": "0.5 * u"})
    result = eq.solve(state, t_range=0.1, dt=1e-3, solver=solver, tracker=None)
    assert isinstance(result, pde.FieldCollection)
    assert all(np.all(np.isfinite(np.asarray(f.data))) for f in result)


@pytest.mark.parametrize("solver", ["euler", "runge-kutta"])
def test_adaptive_solvers_match_fixed(solver, rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.3)
    fixed = eq.solve(state, t_range=0.5, dt=1e-3, solver=solver, tracker=None)
    adaptive, info = eq.solve(
        state, t_range=0.5, dt=1e-3, solver=solver, adaptive=True,
        tolerance=1e-8, tracker=None, ret_info=True,
    )
    # Euler is first order: different dt sequences differ at O(dt)
    rtol = 5e-3 if solver == "euler" else 1e-4
    np.testing.assert_allclose(
        np.asarray(adaptive.data), np.asarray(fixed.data), rtol=rtol, atol=1e-6
    )
    assert info["solver"]["dt_adaptive"]
    stats = info["solver"]["dt_statistics"]
    assert stats.count == info["solver"]["steps"]


@pytest.mark.parametrize("solver", ["euler", "milstein"])
def test_stochastic_solvers_zero_noise_match_deterministic(solver, rng):
    """SDE solvers with noise=0 reproduce the deterministic result."""
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    det = pde.DiffusionPDE(0.5).solve(state, t_range=0.1, dt=1e-3, tracker=None)
    eq = pde.DiffusionPDE(0.5, noise=0)
    res = eq.solve(state, t_range=0.1, dt=1e-3, solver=solver, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(det.data), rtol=1e-10, atol=1e-12
    )


def test_scipy_solver_matches_euler(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.5)
    ref = eq.solve(state, t_range=0.5, dt=1e-4, tracker=None)
    res = eq.solve(state, t_range=0.5, solver="scipy", tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-4, atol=1e-6
    )


def test_implicit_solver_convergence_error():
    """Implicit fixed-point iteration raises ConvergenceError when diverging."""
    from pde_tpu.solvers.base import ConvergenceError

    class StiffPDE(pde.PDEBase):
        def evolution_rate(self, state, t=0):
            return -1e6 * state**3

    grid = pde.UnitGrid([4])
    state = pde.ScalarField(grid, data=2.0)
    eq = StiffPDE()
    with pytest.raises((ConvergenceError, RuntimeError)):
        eq.solve(state, t_range=1.0, dt=1.0, solver="implicit", tracker=None)


@pytest.mark.parametrize("solver", FIXED_SOLVERS + ["milstein"])
def test_solver_info_populated(solver, rng):
    grid = pde.UnitGrid([4, 4], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1, noise=0.1 if solver == "milstein" else 0)
    _, info = eq.solve(
        state, t_range=0.05, dt=1e-2, solver=solver, tracker=None,
        ret_info=True,
    )
    s = info["solver"]
    assert s["steps"] == 5
    assert s["dt"] == pytest.approx(1e-2)
    assert s["backend"] == "jax"
    assert s["stochastic"] == (solver == "milstein")


@pytest.mark.parametrize("solver", ["euler", "runge-kutta", "crank-nicolson"])
def test_solver_complex_state(solver):
    """Complex fields integrate correctly (Schrödinger-type rotation)."""

    class RotationPDE(pde.PDEBase):
        complex_valued = True

        def evolution_rate(self, state, t=0):
            return 1j * state

    grid = pde.UnitGrid([4])
    state = pde.ScalarField(grid, data=np.full(4, 1.0 + 0.0j))
    eq = RotationPDE()
    result = eq.solve(state, t_range=1.0, dt=1e-3, solver=solver, tracker=None)
    expected = np.exp(1j)
    np.testing.assert_allclose(np.asarray(result.data), expected, rtol=1e-2)


def test_solver_dt_propagation_and_default(rng):
    grid = pde.UnitGrid([4, 4], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1)
    # dt=None with adaptive default picks dt automatically and succeeds
    result, info = eq.solve(state, t_range=0.1, tracker=None, ret_info=True)
    assert info["controller"]["t_final"] >= 0.1 - 1e-10
    assert np.all(np.isfinite(np.asarray(result.data)))
