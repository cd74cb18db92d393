"""Tests for trackers and interrupt schedules (mirrors reference tests/trackers/)."""

import io
import math

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.trackers import (
    ConstantInterrupts,
    FixedInterrupts,
    GeometricInterrupts,
    LogarithmicInterrupts,
    RealtimeInterrupts,
    get_named_trackers,
    parse_interrupt,
)
from pde_tpu.trackers.base import FinishedSimulation


def test_constant_interrupts():
    ivals = ConstantInterrupts(2.0)
    assert ivals.initialize(0.0) == 0.0
    assert ivals.next(0.0) == 2.0
    assert ivals.next(2.0) == 4.0
    # skipping ahead
    assert ivals.next(7.0) == 8.0
    # t_start
    ivals2 = ConstantInterrupts(1.0, t_start=5.0)
    assert ivals2.initialize(0.0) == 5.0


def test_fixed_interrupts():
    ivals = FixedInterrupts([1.0, 2.5, 7.0])
    assert ivals.initialize(0.0) == 1.0
    assert ivals.next(1.0) == 2.5
    assert ivals.next(3.0) == 7.0
    assert ivals.next(8.0) == math.inf


def test_logarithmic_interrupts():
    ivals = LogarithmicInterrupts(dt_initial=1.0, factor=2.0)
    t = ivals.initialize(0.0)
    assert t == 0.0
    t1 = ivals.next(t)
    t2 = ivals.next(t1)
    t3 = ivals.next(t2)
    assert (t2 - t1) == pytest.approx(2 * (t1 - t))
    assert (t3 - t2) == pytest.approx(2 * (t2 - t1))


def test_geometric_interrupts():
    ivals = GeometricInterrupts(1.0, 2.0)
    assert ivals.initialize(0.0) == 1.0
    assert ivals.next(1.0) == 2.0
    assert ivals.next(2.0) == 4.0


def test_parse_interrupt():
    assert isinstance(parse_interrupt(2), ConstantInterrupts)
    assert isinstance(parse_interrupt([1, 2]), FixedInterrupts)
    assert isinstance(parse_interrupt("0:10"), RealtimeInterrupts)
    assert isinstance(parse_interrupt(ConstantInterrupts(1)), ConstantInterrupts)
    with pytest.raises(TypeError):
        parse_interrupt(object())


def test_named_trackers():
    named = get_named_trackers()
    for name in ["progress", "consistency", "steady_state", "print",
                 "material_conservation"]:
        assert name in named


@pytest.fixture
def simulation(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    return pde.DiffusionPDE(), state


def test_callback_tracker(simulation):
    eq, state = simulation
    seen_one, seen_two = [], []
    eq.solve(state, t_range=1, dt=0.1, tracker=[
        pde.CallbackTracker(lambda field: seen_one.append(float(field.average)), 0.5),
        pde.CallbackTracker(lambda field, t: seen_two.append(t), 0.5),
    ])
    assert len(seen_one) == 3
    assert seen_two == [0.0, 0.5, 1.0]


def test_print_tracker(simulation):
    eq, state = simulation
    stream = io.StringIO()
    eq.solve(state, t_range=1, dt=0.1, tracker=pde.PrintTracker(0.5, stream=stream))
    output = stream.getvalue()
    assert "t=0" in output
    assert "t=1" in output


def test_data_tracker(simulation, tmp_path):
    eq, state = simulation
    tracker = pde.DataTracker(lambda field, t: {"mean": float(field.average)},
                              interrupts=0.25)
    eq.solve(state, t_range=1, dt=0.05, tracker=tracker)
    assert len(tracker.times) == 5
    df = tracker.dataframe
    assert list(df.columns) == ["time", "mean"]
    path = str(tmp_path / "data.csv")
    tracker.to_file(path)
    import pandas as pd

    assert len(pd.read_csv(path)) == 5


def test_consistency_tracker():
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField(grid, 1.0)
    # equation that blows up rapidly
    eq = pde.PDE({"c": "c**3 * 1e10 + c"})
    result, info = eq.solve(state, t_range=100, dt=10.0, tracker=["consistency"],
                            ret_info=True)
    assert not info["controller"]["successful"]
    assert info["controller"]["t_final"] < 100


def test_material_conservation_tracker(simulation):
    eq, state = simulation
    result, info = eq.solve(
        state, t_range=1, dt=0.1,
        tracker=pde.MaterialConservationTracker(0.5), ret_info=True,
    )
    assert info["controller"]["successful"]


def test_steady_state_tracker_rate(simulation):
    eq, state = simulation
    tracker = pde.SteadyStateTracker(
        interrupts=1.0, atol=1e-6, rtol=1e-6, evolution_rate=eq.evolution_rate
    )
    result, info = eq.solve(state, t_range=10000, dt=0.1, tracker=tracker,
                            ret_info=True)
    assert info["controller"]["t_final"] < 10000


def test_max_runtime_tracker(simulation):
    eq, state = simulation
    result, info = eq.solve(
        state, t_range=1e6, dt=0.1,
        tracker=pde.MaxRuntimeTracker(0.5, interrupts=1.0), ret_info=True,
    )
    assert info["controller"]["successful"]  # FinishedSimulation counts as success
    assert info["controller"]["t_final"] < 1e6


def test_walltime_tracker(simulation):
    eq, state = simulation
    _, info = eq.solve(
        state, t_range=1, dt=0.1, tracker=pde.WalltimeTracker(0.5), ret_info=True
    )
    assert info["profiler"]["walltime"] > 0


def test_tracker_collection_ordering(simulation):
    eq, state = simulation
    order = []
    t1 = pde.CallbackTracker(lambda f, t: order.append(("a", t)), 0.5)
    t2 = pde.CallbackTracker(lambda f, t: order.append(("b", t)), 1.0)
    eq.solve(state, t_range=2, dt=0.1, tracker=[t1, t2])
    assert ("a", 0.5) in order
    assert ("b", 1.0) in order
    assert ("b", 0.5) not in order
