"""Tests for the Controller (mirrors reference tests/solvers/test_controller.py)."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.solvers import Controller, EulerSolver


@pytest.fixture
def setup(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    return pde.DiffusionPDE(), state


def test_t_range_forms(setup):
    eq, state = setup
    c = Controller(EulerSolver(eq), t_range=5)
    assert c.t_range == (0.0, 5.0)
    c2 = Controller(EulerSolver(eq), t_range=(1, 3))
    assert c2.t_range == (1.0, 3.0)
    with pytest.raises(ValueError):
        Controller(EulerSolver(eq), t_range=(1, 2, 3))


def test_controller_run_and_profiler(setup):
    eq, state = setup
    solver = EulerSolver(eq)
    controller = Controller(solver, t_range=1, tracker=None)
    result = controller.run(state, dt=0.01)
    assert controller.info["successful"]
    assert controller.info["t_final"] == pytest.approx(1.0)
    profiler = controller.info["profiler"]
    assert set(profiler) >= {"compilation", "solver", "tracker"}
    assert profiler["solver"] > 0
    assert controller.diagnostics["solver"]["steps"] == 100
    assert "package_version" in controller.diagnostics
    assert np.all(np.isfinite(np.asarray(result.data)))


def test_controller_nonzero_start(setup):
    eq, state = setup
    controller = Controller(EulerSolver(eq), t_range=(2, 3), tracker=None)
    controller.run(state, dt=0.01)
    assert controller.info["t_final"] == pytest.approx(3.0)
    assert controller.diagnostics["solver"]["steps"] == 100


def test_controller_stop_reason(setup):
    eq, state = setup
    tracker = pde.MaxRuntimeTracker(0.0, interrupts=0.1)  # stops immediately
    controller = Controller(EulerSolver(eq), t_range=1000, tracker=tracker)
    controller.run(state, dt=0.1)
    assert "stop_reason" in controller.info
    assert controller.info["successful"]  # FinishedSimulation is a clean stop


def test_explicit_deprecated_alias(setup):
    eq, state = setup
    result = eq.solve(state, t_range=0.1, dt=0.01, solver="explicit", tracker=None)
    assert np.all(np.isfinite(np.asarray(result.data)))


def test_scipy_solver_method_kwargs(setup):
    eq, state = setup
    result = eq.solve(
        state, t_range=0.2, solver="scipy", method="RK23", tracker=None
    )
    ref = eq.solve(state, t_range=0.2, dt=1e-3, solver="runge-kutta", tracker=None)
    np.testing.assert_allclose(
        np.asarray(result.data), np.asarray(ref.data), atol=1e-2
    )


def test_pde_diagnostics_surface(setup):
    eq, state = setup
    eq2 = pde.PDE({"c": "laplace(c) + sin(t)"})
    _, info = eq2.solve(state, t_range=0.1, dt=0.01, tracker=None, ret_info=True)
    pde_info = eq2.diagnostics["pde"]
    assert pde_info["variables"] == ["c"]
    assert pde_info["explicit_time_dependence"]
    assert "laplace" in pde_info["operators"]
    assert "controller" in info and "solver" in info
