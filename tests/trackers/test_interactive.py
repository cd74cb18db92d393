"""Queue-level tests of the interactive (napari) tracker with a fake viewer.

Reference: `/root/reference/pde/trackers/interactive.py:27-310`. napari itself
is absent here; the multiprocessing queue protocol is exercised by a fake
viewer process that records the messages it receives.
"""

import json
import queue as queue_mod
from functools import partial

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.trackers.interactive import InteractivePlotTracker, NapariViewer


def _fake_viewer(result_path, data_channel, initial_data):
    """Stands in for napari_process: drains the queue and records messages."""
    n_updates = 0
    closed = False
    while True:
        try:
            action, payload = data_channel.get(timeout=10)
        except queue_mod.Empty:
            break
        if action == "close":
            closed = True
            break
        if action == "update_data":
            n_updates += 1
            layers = sorted(payload)
    with open(result_path, "w") as fh:
        json.dump(
            {
                "initial_layers": sorted(initial_data),
                "updates": n_updates,
                "closed": closed,
            },
            fh,
        )


def test_napari_viewer_queue_protocol(rng, tmp_path):
    result = tmp_path / "viewer.json"
    grid = pde.UnitGrid([8, 8])
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    viewer = NapariViewer(state, process_target=partial(_fake_viewer, str(result)))
    viewer.update(state, t=0.5)
    viewer.update(state, t=1.0)
    viewer.close()
    recorded = json.load(open(result))
    assert recorded["updates"] == 2
    assert recorded["closed"] is True
    assert recorded["initial_layers"]  # the initial state produced layers


def test_interactive_tracker_in_solve(rng, tmp_path):
    result = tmp_path / "tracker.json"
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    tracker = InteractivePlotTracker(
        interrupts=0.05, _process_target=partial(_fake_viewer, str(result))
    )
    eq = pde.DiffusionPDE(0.1)
    eq.solve(state, t_range=0.2, dt=0.01, tracker=tracker)
    recorded = json.load(open(result))
    assert recorded["updates"] >= 3
    assert recorded["closed"] is True


def test_napari_viewer_requires_napari_without_target(rng):
    grid = pde.UnitGrid([4, 4])
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    pytest.importorskip  # (documented intent: no napari in this env)
    try:
        import napari  # noqa: F401

        pytest.skip("napari unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        NapariViewer(state)


def test_napari_available_helper():
    from pde_tpu.trackers.interactive import napari_available

    # in this environment napari is absent; the helper must not raise
    assert napari_available() is False


def test_field_plot_interactive_gating(rng):
    # 1D fields are rejected before napari is even imported
    state_1d = pde.ScalarField.random_uniform(pde.UnitGrid([8]), rng=rng)
    with pytest.raises(RuntimeError, match="2 spatial dimensions"):
        state_1d.plot_interactive()
    # 2D fields require the optional napari package
    state_2d = pde.ScalarField.random_uniform(pde.UnitGrid([4, 4]), rng=rng)
    with pytest.raises(ImportError, match="napari"):
        state_2d.plot_interactive()
