"""Tests for the solver suite (mirrors reference tests/solvers/)."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.solvers import registered_solvers
from pde_tpu.solvers.base import SolverBase


@pytest.fixture
def diffusion_setup(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(diffusivity=0.5)
    return eq, state


def test_registered_solvers():
    names = registered_solvers()
    for name in ["euler", "explicit", "runge-kutta", "implicit", "crank-nicolson",
                 "adams-bashforth", "scipy", "milstein"]:
        assert name in names
    with pytest.raises(ValueError):
        SolverBase.from_name("unknown-solver", pde=None)


@pytest.mark.parametrize(
    "solver,kwargs",
    [
        ("euler", {}),
        ("runge-kutta", {}),
        ("adams-bashforth", {}),
        ("implicit", {}),
        ("crank-nicolson", {}),
    ],
)
def test_solver_accuracy(diffusion_setup, solver, kwargs):
    eq, state = diffusion_setup
    # high-order reference: fixed-dt RK4 at small dt is effectively exact
    ref = eq.solve(state, t_range=0.5, dt=1e-3, solver="runge-kutta", tracker=None)
    result = eq.solve(state, t_range=0.5, dt=0.01, solver=solver, tracker=None, **kwargs)
    atol = 5e-3 if solver in ("euler", "implicit") else 1e-3
    np.testing.assert_allclose(
        np.asarray(result.data), np.asarray(ref.data), atol=atol,
        err_msg=f"solver {solver} deviates",
    )


def test_adaptive_euler(diffusion_setup):
    eq, state = diffusion_setup
    result, info = eq.solve(
        state, t_range=1.0, solver="euler", adaptive=True, tolerance=1e-5,
        tracker=None, ret_info=True,
    )
    assert info["solver"]["dt_adaptive"]
    assert info["solver"]["steps"] > 0
    stats = info["solver"]["dt_statistics"]
    assert stats.count == info["solver"]["steps"]
    assert stats.min > 0
    ref = eq.solve(state, t_range=1.0, dt=1e-3, solver="runge-kutta", tracker=None)
    np.testing.assert_allclose(np.asarray(result.data), np.asarray(ref.data), atol=1e-3)


def test_adaptive_rk45(diffusion_setup):
    eq, state = diffusion_setup
    result, info = eq.solve(
        state, t_range=1.0, solver="runge-kutta", adaptive=True, tolerance=1e-8,
        tracker=None, ret_info=True,
    )
    ref = eq.solve(state, t_range=1.0, dt=0.01, solver="runge-kutta", tracker=None)
    np.testing.assert_allclose(np.asarray(result.data), np.asarray(ref.data), atol=1e-5)
    # RK45 should take far fewer steps than fixed-dt Euler
    assert info["solver"]["steps"] < 200


def test_scipy_solver(diffusion_setup):
    eq, state = diffusion_setup
    result = eq.solve(state, t_range=0.5, solver="scipy", tracker=None)
    ref = eq.solve(state, t_range=0.5, dt=1e-3, solver="runge-kutta", tracker=None)
    np.testing.assert_allclose(np.asarray(result.data), np.asarray(ref.data), atol=1e-3)


def test_stochastic_solvers(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    eq = pde.DiffusionPDE(diffusivity=0.1, noise=0.5, rng=rng)
    assert eq.is_sde
    res_em = eq.solve(state, t_range=1, dt=0.01, tracker=None)
    assert 0.1 < float(res_em.fluctuations) < 10
    res_mil = eq.solve(state, t_range=1, dt=0.01, solver="milstein", tracker=None)
    assert 0.1 < float(res_mil.fluctuations) < 10
    # adaptive stepping must refuse stochastic equations
    with pytest.raises(RuntimeError):
        eq.solve(state, t_range=1, solver="euler", adaptive=True, tracker=None)


def test_stochastic_reproducibility():
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    results = []
    for _ in range(2):
        eq = pde.DiffusionPDE(noise=1.0, rng=np.random.default_rng(1234))
        results.append(eq.solve(state, t_range=0.1, dt=0.01, tracker=None))
    np.testing.assert_allclose(
        np.asarray(results[0].data), np.asarray(results[1].data)
    )


def test_wave_energy_conservation(rng):
    grid = pde.CartesianGrid([(0, 10)], 64, periodic=True)
    u0 = pde.ScalarField.from_expression(grid, "exp(-(x-5)**2)")
    eq = pde.WavePDE(speed=1)
    init = eq.get_initial_condition(u0)
    result = eq.solve(init, t_range=1, dt=1e-3, tracker=None)
    assert isinstance(result, pde.FieldCollection)
    # mass of u is conserved for periodic wave equation
    assert float(result[0].integral) == pytest.approx(float(u0.integral), rel=1e-6)


def test_controller_diagnostics(diffusion_setup):
    eq, state = diffusion_setup
    _, info = eq.solve(state, t_range=0.1, dt=0.01, tracker=None, ret_info=True)
    assert info["controller"]["successful"]
    assert info["controller"]["t_final"] == pytest.approx(0.1)
    assert "profiler" in info["controller"]
    assert info["solver"]["steps"] == 10


def test_post_step_hook():
    class ClampedDiffusion(pde.DiffusionPDE):
        def make_post_step_hook(self, state):
            import jax.numpy as jnp

            def hook(leaves, t, data):
                clipped = [jnp.minimum(y, 1.0) for y in leaves]
                modifications = data + sum(
                    jnp.sum(y != c) for y, c in zip(leaves, clipped)
                )
                return clipped, modifications

            return hook, 0.0

    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.from_expression(
        pde.CartesianGrid([(0, 8)], 8, periodic=True), "2"
    )
    eq = ClampedDiffusion()
    result = eq.solve(state, t_range=0.1, dt=0.01, tracker=None)
    assert float(result.data.max()) <= 1.0


def test_solver_backend_kwarg_accepted(diffusion_setup):
    eq, state = diffusion_setup
    result = eq.solve(state, t_range=0.1, dt=0.01, backend="numba", tracker=None)
    assert result is not None


def test_adjust_dt_boundaries():
    """Pin the dt adjuster at its branch boundaries (reference `base.py:533`)."""
    from pde_tpu.solvers.base import adjust_dt

    crossover = (0.9 / 4.0) ** 5
    # tiny errors grow dt by exactly the 4x cap
    assert float(adjust_dt(1.0, crossover / 2)) == pytest.approx(4.0)
    assert float(adjust_dt(1.0, 0.0)) == pytest.approx(4.0)
    # just above the crossover the smooth formula takes over continuously
    just_above = crossover * (1 + 1e-9)
    assert float(adjust_dt(1.0, just_above)) == pytest.approx(4.0, rel=1e-6)
    # error at tolerance shrinks dt slightly (0.9 factor)
    assert float(adjust_dt(1.0, 1.0)) == pytest.approx(0.9)
    # huge errors shrink dt by at most 10x
    assert float(adjust_dt(1.0, 1e12)) == pytest.approx(0.1)
    # non-finite errors (NaN/inf state) shrink dt by 4x
    assert float(adjust_dt(1.0, np.nan)) == pytest.approx(0.25)
    assert float(adjust_dt(1.0, np.inf)) == pytest.approx(0.25)


@pytest.mark.parametrize("impl", ["rbg", "unsafe_rbg"])
def test_stochastic_rng_impl_config(impl, rng):
    """`sde.rng_impl` routes SDE noise through the XLA RngBitGenerator
    (hardware PRNG on TPU) — statistics must match the threefry default."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    eq = pde.DiffusionPDE(diffusivity=0.1, noise=0.5, rng=rng)
    with pde.config({"sde.rng_impl": impl}):
        from pde_tpu.solvers.euler import EulerSolver

        solver = pde.solvers.Controller(
            EulerSolver(eq), t_range=1, tracker=None
        )
        res = solver.run(state, dt=0.01)
        assert solver.solver.info["rng_impl"] == impl
    assert 0.1 < float(res.fluctuations) < 10
    # default stays reproducible threefry
    eq2 = pde.DiffusionPDE(noise=1.0, rng=np.random.default_rng(7))
    solver2 = pde.solvers.Controller(
        pde.solvers.EulerSolver(eq2), t_range=0.05, tracker=None
    )
    solver2.run(state, dt=0.01)
    assert solver2.solver.info["rng_impl"] == "threefry2x32"
