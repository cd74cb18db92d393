"""Tracker and interrupt depth: every tracker class and interrupt schedule.

Extends toward the reference tracker suite
(`/root/reference/tests/trackers/test_trackers.py`).
"""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.trackers import (
    ConsistencyTracker,
    ConstantInterrupts,
    FixedInterrupts,
    GeometricInterrupts,
    LogarithmicInterrupts,
    RealtimeInterrupts,
    SteadyStateTracker,
    TrackerCollection,
    parse_interrupt,
)


def _setup(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    return pde.DiffusionPDE(0.2), state


# -- interrupt schedules ---------------------------------------------------------------


def test_constant_interrupts_sequence():
    it = ConstantInterrupts(dt=0.5, t_start=1.0)
    assert it.initialize(0.0) == pytest.approx(1.0)
    assert it.next(1.0) == pytest.approx(1.5)
    assert it.next(1.5) == pytest.approx(2.0)


def test_fixed_interrupts_sequence():
    it = FixedInterrupts([0.1, 0.4, 2.0])
    assert it.initialize(0.0) == pytest.approx(0.1)
    assert it.next(0.1) == pytest.approx(0.4)
    assert it.next(0.4) == pytest.approx(2.0)
    assert np.isinf(it.next(2.0))


def test_logarithmic_interrupts_growth():
    it = LogarithmicInterrupts(dt_initial=0.1, factor=2.0)
    it.initialize(0.0)
    t1 = it.next(0.0)
    t2 = it.next(t1)
    t3 = it.next(t2)
    assert (t3 - t2) == pytest.approx(2.0 * (t2 - t1))


def test_geometric_interrupts_sequence():
    it = GeometricInterrupts(scale=0.1, factor=10.0)
    it.initialize(0.0)
    times = []
    t = 0.0
    for _ in range(3):
        t = it.next(t)
        times.append(t)
    ratios = np.diff(np.log(times))
    np.testing.assert_allclose(ratios, np.log(10.0), rtol=1e-10)


def test_parse_interrupt_forms():
    assert isinstance(parse_interrupt(0.5), ConstantInterrupts)
    assert isinstance(parse_interrupt([0.1, 0.2]), FixedInterrupts)
    rt = parse_interrupt("0:00:10")
    assert isinstance(rt, RealtimeInterrupts)
    existing = ConstantInterrupts(1.0)
    parsed = parse_interrupt(existing)
    assert isinstance(parsed, ConstantInterrupts) and parsed.dt == 1.0
    with pytest.raises((TypeError, ValueError)):
        parse_interrupt(object())


# -- trackers ---------------------------------------------------------------------------


def test_callback_tracker_times(rng):
    eq, state = _setup(rng)
    seen = []
    tracker = pde.CallbackTracker(lambda s, t: seen.append(t), interrupts=0.25)
    eq.solve(state, t_range=1.0, dt=0.01, tracker=tracker)
    np.testing.assert_allclose(seen, [0.0, 0.25, 0.5, 0.75, 1.0], atol=1e-8)


def test_data_tracker_pandas_export(rng, tmp_path):
    eq, state = _setup(rng)
    tracker = pde.DataTracker(lambda s, t: {"avg": float(s.average)},
                              interrupts=0.5)
    eq.solve(state, t_range=1.0, dt=0.01, tracker=tracker)
    assert len(tracker.data) == 3
    df = tracker.dataframe
    assert list(df["time"]) == pytest.approx([0.0, 0.5, 1.0])
    path = tmp_path / "data.pickle"
    tracker.to_file(str(path))
    assert path.exists()


def test_steady_state_tracker_stops(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(1.0)
    tracker = SteadyStateTracker(atol=1e-8, rtol=1e-8, interrupts=1.0)
    result, info = eq.solve(state, t_range=1000, dt=0.1, tracker=tracker,
                            ret_info=True)
    # converged long before t=1000
    assert info["controller"]["t_final"] < 1000
    np.testing.assert_allclose(np.asarray(result.data),
                               float(state.average), rtol=1e-4)


def test_consistency_tracker_aborts_on_nan():
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField(grid, data=1.0)

    class BlowUpPDE(pde.PDEBase):
        def evolution_rate(self, state, t=0):
            return state * float("nan")

    eq = BlowUpPDE()
    tracker = ConsistencyTracker(interrupts=0.05)
    result, info = eq.solve(state, t_range=1.0, dt=0.01, tracker=tracker,
                            ret_info=True)
    assert info["controller"]["t_final"] < 1.0  # aborted early


def test_material_conservation_tracker(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.CahnHilliardPDE()
    tracker = pde.trackers.MaterialConservationTracker(interrupts=0.05)
    eq.solve(state, t_range=0.1, dt=1e-4, tracker=tracker)  # no exception


def test_progress_and_print_trackers(rng, capsys):
    eq, state = _setup(rng)
    eq.solve(state, t_range=0.1, dt=0.01, tracker=["progress", "print"])
    captured = capsys.readouterr()
    assert "t=" in captured.out or captured.err  # print tracker wrote lines


def test_tracker_collection_next_interrupt(rng):
    eq, state = _setup(rng)
    t_a, t_b = [], []
    col = TrackerCollection([
        pde.CallbackTracker(lambda s, t: t_a.append(t), interrupts=0.3),
        pde.CallbackTracker(lambda s, t: t_b.append(t), interrupts=0.5),
    ])
    eq.solve(state, t_range=1.0, dt=0.01, tracker=col)
    assert len(t_a) >= 4 and len(t_b) >= 3


def test_tracker_from_registered_name(rng):
    eq, state = _setup(rng)
    result = eq.solve(state, t_range=0.1, dt=0.01, tracker="consistency")
    assert result is not None


def test_interrupt_tracker_finalize_called(rng):
    eq, state = _setup(rng)
    calls = {"finalized": False}

    class MyTracker(pde.trackers.TrackerBase):
        def handle(self, state, t):
            pass

        def finalize(self, info=None):
            calls["finalized"] = True

    eq.solve(state, t_range=0.05, dt=0.01, tracker=MyTracker(interrupts=0.01))
    assert calls["finalized"]


def test_plot_tracker_writes_files(rng, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    eq, state = _setup(rng)
    tracker = pde.PlotTracker(interrupts=0.05, output_file=str(tmp_path / "p.png"),
                              show=False)
    eq.solve(state, t_range=0.1, dt=0.01, tracker=tracker)
    assert (tmp_path / "p.png").exists()
