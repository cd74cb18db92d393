"""Visualization depth: plots, kymographs, magnitudes, ScalarFieldPlot.

Extends toward the reference visualization suite
(`/root/reference/tests/visualization/`).
"""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.storage import MemoryStorage
from pde_tpu.visualization import (
    ScalarFieldPlot,
    plot_kymograph,
    plot_kymographs,
    plot_magnitudes,
)


@pytest.fixture
def storage_1d(rng):
    grid = pde.CartesianGrid([(0, 8)], 32, periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = MemoryStorage()
    pde.DiffusionPDE(0.5).solve(state, t_range=1, dt=0.01,
                                tracker=storage.tracker(0.25))
    return storage


@pytest.fixture
def storage_2d(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = MemoryStorage()
    pde.DiffusionPDE(0.5).solve(state, t_range=0.5, dt=0.01,
                                tracker=storage.tracker(0.25))
    return storage


def test_plot_kymograph_returns_axes(storage_1d):
    ref = plot_kymograph(storage_1d)
    assert ref is not None
    plt.close("all")


def test_plot_kymographs_collection(rng):
    grid = pde.CartesianGrid([(0, 4)], 16, periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.ScalarField.random_uniform(grid, rng=rng, label="v")
    storage = MemoryStorage()
    eq = pde.PDE({"u": "0.1 * laplace(u)", "v": "0.2 * laplace(v)"})
    eq.solve(pde.FieldCollection([u, v]), t_range=0.2, dt=0.01,
             tracker=storage.tracker(0.1))
    plot_kymographs(storage)
    plt.close("all")


def test_plot_magnitudes(storage_1d):
    plot_magnitudes(storage_1d)
    plt.close("all")


def test_scalar_field_plot_update_and_movie(storage_2d, tmp_path):
    field = storage_2d[0]
    sfp = ScalarFieldPlot(field)
    sfp.update(storage_2d[1], title="t=0.25")
    out = tmp_path / "frame.png"
    sfp.savefig(str(out))
    assert out.exists()
    plt.close("all")


def test_field_plot_kinds(rng, tmp_path):
    grid = pde.UnitGrid([8, 8])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    field.plot(kind="image", filename=str(tmp_path / "a.png"))
    field.plot(kind="line", filename=str(tmp_path / "b.png"))
    assert (tmp_path / "a.png").exists() and (tmp_path / "b.png").exists()
    plt.close("all")


def test_collection_plot(rng, tmp_path):
    grid = pde.UnitGrid([6, 6])
    fc = pde.FieldCollection([
        pde.ScalarField.random_uniform(grid, rng=rng, label="a"),
        pde.ScalarField.random_uniform(grid, rng=rng, label="b"),
    ])
    fc.plot(filename=str(tmp_path / "fc.png"))
    assert (tmp_path / "fc.png").exists()
    plt.close("all")


def test_movie_class_unavailable_without_ffmpeg(tmp_path):
    from pde_tpu.visualization import Movie

    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present")
    assert not Movie.is_available()
    with pytest.raises(RuntimeError):
        Movie(str(tmp_path / "m.mp4"))
