"""Controller depth: stop handling, profiling, time ranges, diagnostics.

Extends toward the reference controller behavior
(`/root/reference/pde/solvers/controller.py:33-439`).
"""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.solvers import Controller, EulerSolver
from pde_tpu.trackers.base import FinishedSimulation


def _solver(rng, **kwargs):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    return EulerSolver(pde.DiffusionPDE(0.1), **kwargs), state


def test_t_range_forms(rng):
    solver, state = _solver(rng)
    c = Controller(solver, t_range=2.0, tracker=None)
    assert c.t_range == (0.0, 2.0)
    c = Controller(solver, t_range=(1.0, 3.0), tracker=None)
    assert c.t_range == (1.0, 3.0)
    with pytest.raises((ValueError, TypeError)):
        Controller(solver, t_range=(0, 1, 2), tracker=None)


def test_controller_profiler_keys(rng):
    solver, state = _solver(rng)
    controller = Controller(solver, t_range=0.1, tracker=None)
    controller.run(state, dt=0.01)
    prof = controller.diagnostics["controller"]["profiler"]
    assert {"compilation", "solver"} <= set(prof)
    assert prof["solver"] >= 0


def test_finished_simulation_stops_cleanly(rng):
    solver, state = _solver(rng)

    class StopTracker(pde.trackers.TrackerBase):
        def handle(self, state, t):
            if t >= 0.05:
                raise FinishedSimulation("done early")

    controller = Controller(solver, t_range=10.0,
                            tracker=StopTracker(interrupts=0.01))
    result = controller.run(state, dt=0.01)
    info = controller.diagnostics["controller"]
    assert info["t_final"] < 10.0
    assert info["successful"]


def test_stop_iteration_aborts(rng):
    solver, state = _solver(rng)

    class AbortTracker(pde.trackers.TrackerBase):
        def handle(self, state, t):
            if t >= 0.05:
                raise StopIteration

    controller = Controller(solver, t_range=10.0,
                            tracker=AbortTracker(interrupts=0.01))
    controller.run(state, dt=0.01)
    assert controller.diagnostics["controller"]["t_final"] < 10.0


def test_controller_records_package_version(rng):
    solver, state = _solver(rng)
    controller = Controller(solver, t_range=0.05, tracker=None)
    controller.run(state, dt=0.01)
    assert "package_version" in controller.diagnostics


def test_controller_nonzero_start_time(rng):
    solver, state = _solver(rng)
    times = []
    tracker = pde.CallbackTracker(lambda s, t: times.append(t), interrupts=0.5)
    controller = Controller(solver, t_range=(1.0, 2.0), tracker=tracker)
    controller.run(state, dt=0.01)
    assert times[0] == pytest.approx(1.0)
    assert times[-1] == pytest.approx(2.0)


def test_solve_with_t_range_tuple(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1)
    result, info = eq.solve(state, t_range=(0.5, 1.0), dt=0.01, tracker=None,
                            ret_info=True)
    assert info["controller"]["t_final"] == pytest.approx(1.0)


def test_tracker_overhead_warning_mechanism(rng):
    """Tracker time is accounted separately from solver time."""
    solver, state = _solver(rng)
    import time

    def slow_callback(s, t):
        time.sleep(0.001)

    tracker = pde.CallbackTracker(slow_callback, interrupts=0.01)
    controller = Controller(solver, t_range=0.1, tracker=tracker)
    controller.run(state, dt=0.01)
    prof = controller.diagnostics["controller"]["profiler"]
    assert prof.get("tracker", 0) > 0


def test_time_sync_single_process(rng):
    """Single-process runs need no interrupt-time broadcast."""
    from pde_tpu.solvers import Controller, EulerSolver

    solver = EulerSolver(pde.DiffusionPDE(0.1))
    controller = Controller(solver, t_range=0.05, tracker=None)
    assert controller._make_time_sync() is None
