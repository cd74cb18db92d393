"""Smoke tests for visualization (headless matplotlib)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.visualization import (
    ScalarFieldPlot,
    plot_kymograph,
    plot_kymographs,
    plot_magnitudes,
)


@pytest.fixture
def storage_1d(rng):
    grid = pde.CartesianGrid([(0, 10)], 32, periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = pde.MemoryStorage()
    pde.DiffusionPDE().solve(state, t_range=1, dt=0.01, tracker=storage.tracker(0.25))
    return storage


def test_plot_kymograph(storage_1d):
    import matplotlib.pyplot as plt

    im = plot_kymograph(storage_1d)
    assert im is not None
    im2 = plot_kymograph(storage_1d, transpose=True)
    assert im2 is not None
    plt.close("all")


def test_plot_magnitudes(storage_1d):
    import matplotlib.pyplot as plt

    lines = plot_magnitudes(storage_1d)
    assert lines is not None
    plt.close("all")


def test_plot_magnitudes_collection(rng):
    import matplotlib.pyplot as plt

    grid = pde.UnitGrid([8], periodic=True)
    col = pde.FieldCollection(
        [pde.ScalarField.random_uniform(grid, rng=rng, label="u"),
         pde.ScalarField.random_uniform(grid, rng=rng, label="v")]
    )
    storage = pde.MemoryStorage.from_fields([0, 1], [col, col * 2])
    lines = plot_magnitudes(storage)
    assert len(lines) == 2
    plt.close("all")


def test_kymographs_collection(rng):
    import matplotlib.pyplot as plt

    grid = pde.CartesianGrid([(0, 5)], 16, periodic=True)
    col = pde.FieldCollection(
        [pde.ScalarField.random_uniform(grid, rng=rng, label="u"),
         pde.ScalarField.random_uniform(grid, rng=rng, label="v")]
    )
    storage = pde.MemoryStorage.from_fields([0, 1, 2], [col, col, col])
    images = plot_kymographs(storage)
    assert len(images) == 2
    plt.close("all")


def test_scalar_field_plot(rng):
    import matplotlib.pyplot as plt

    grid = pde.UnitGrid([8, 8])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    plot = ScalarFieldPlot(field, show=False)
    plot.update(field, title="t=0")
    plot.update(field * 2, title="t=1")
    plt.close("all")


def test_field_plots(rng):
    import matplotlib.pyplot as plt

    # 1d line plot
    f1 = pde.ScalarField.random_uniform(pde.UnitGrid([16]), rng=rng)
    f1.plot()
    # 2d image plot
    f2 = pde.ScalarField.random_uniform(pde.UnitGrid([8, 8]), rng=rng)
    f2.plot(colorbar=True, title="test")
    # vector quiver
    v = pde.VectorField.random_uniform(pde.UnitGrid([8, 8]), rng=rng)
    v.plot("vector")
    # collection panels
    col = pde.FieldCollection([f2, f2 * 2], labels=["a", "b"])
    col.plot()
    # tensor components
    t = pde.Tensor2Field.random_uniform(pde.UnitGrid([4, 4]), rng=rng)
    t.plot_components()
    # curvilinear image
    fp = pde.ScalarField.random_uniform(pde.PolarSymGrid(2, 8), rng=rng)
    fp.plot("image")
    plt.close("all")


def test_movie_requires_encoder():
    import shutil

    from pde_tpu.utils import movie_native
    from pde_tpu.visualization import Movie

    if movie_native.is_available() or shutil.which("ffmpeg"):
        assert Movie.is_available()
    else:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            Movie("/tmp/test.mp4")


def test_movie_storage_backend_selection(tmp_path):
    import shutil

    from pde_tpu.storage.movie import MovieStorage
    from pde_tpu.utils import movie_native

    storage = MovieStorage(str(tmp_path / "movie.avi"), vmin=0, vmax=1)
    if movie_native.is_available():
        expected = "native"
    elif shutil.which("ffmpeg"):
        expected = "ffmpeg"
    else:
        expected = "raw"
    assert storage._backend == expected
    grid = pde.UnitGrid([16, 16])
    field = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
    storage.start_writing(field)
    storage.append(field, 0.0)
    storage.append(field * 0.5, 1.0)
    storage.end_writing()
    restored = MovieStorage(str(tmp_path / "movie.avi"))
    assert len(restored) == 2
    np.testing.assert_allclose(
        np.asarray(restored[0].data), np.asarray(field.data), atol=1e-3
    )
