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


def test_time_sync_propagates_process0_status(rng, monkeypatch):
    """Client processes must adopt process 0's success status on a stop.

    Simulates a 2-process run on process 1: a stop broadcast carrying
    ok=False (process 0's tracker aborted) must yield successful=False on
    the client too, and client trackers must be disabled.
    """
    import jax
    from jax.experimental import multihost_utils

    solver, state = _solver(rng)
    tracker_calls = []
    tracker = pde.CallbackTracker(
        lambda s, t: tracker_calls.append(t), interrupts=0.01
    )
    controller = Controller(solver, t_range=0.1, tracker=tracker)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    # process 0 stopped during initialization with an error status
    monkeypatch.setattr(
        multihost_utils,
        "broadcast_one_to_all",
        lambda payload: np.array([0.0, 1.0, 0.0]),
    )
    controller.run(state, dt=0.01)
    assert controller.info["successful"] is False
    assert tracker_calls == []  # trackers run on process 0 only


def test_time_sync_broadcast_payload(rng, monkeypatch):
    """The sync payload carries (t_next, stop, ok) from process 0."""
    import jax

    solver, state = _solver(rng)
    controller = Controller(solver, t_range=0.1, tracker=None)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    sync = controller._make_time_sync()
    sent = {}
    from jax.experimental import multihost_utils

    def fake_broadcast(payload):
        sent["payload"] = np.asarray(payload)
        return payload

    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", fake_broadcast)
    t, stop, ok = sync(1.5, True, ok=False)
    np.testing.assert_allclose(sent["payload"], [1.5, 1.0, 0.0])
    assert (t, stop, ok) == (1.5, True, False)
    t, stop, ok = sync(2.5, False)
    assert (t, stop, ok) == (2.5, False, True)
