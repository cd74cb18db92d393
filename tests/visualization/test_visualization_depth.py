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


def test_movie_class_encodes_figures(tmp_path, rng):
    """Movie writes rendered figures through whatever encoder is present
    (native libav codec preferred; ffmpeg subprocess; else unavailable)."""
    import shutil

    from pde_tpu.utils import movie_native
    from pde_tpu.visualization import Movie

    if not (movie_native.is_available() or shutil.which("ffmpeg")):
        assert not Movie.is_available()
        with pytest.raises(RuntimeError):
            Movie(str(tmp_path / "m.mp4"))
        return

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = tmp_path / "m.mp4"
    with Movie(str(path), framerate=10) as writer:
        for i in range(3):
            fig = plt.figure(figsize=(2, 2), dpi=50)
            plt.imshow(rng.random((8, 8)))
            writer.add_figure(fig)
            plt.close(fig)
    assert path.exists() and path.stat().st_size > 500


def test_movie_fractional_framerate(tmp_path, rng):
    """Fractional rates (23.976 = 24000/1001) keep their exact timing in
    the native path — the codec takes a rational, not int(framerate)
    (round-4 advisor finding)."""
    from pde_tpu.utils import movie_native
    from pde_tpu.visualization import Movie

    if not movie_native.is_available():
        pytest.skip("native movie codec unavailable")
    cv2 = pytest.importorskip("cv2")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = tmp_path / "frac.mp4"
    with Movie(str(path), framerate=23.976) as writer:
        for _ in range(3):
            fig = plt.figure(figsize=(2, 2), dpi=50)
            plt.imshow(rng.random((8, 8)))
            writer.add_figure(fig)
            plt.close(fig)
    cap = cv2.VideoCapture(str(path))
    try:
        assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(23.976, abs=1e-3)
    finally:
        cap.release()


# -- live-updating plot infrastructure (reference tools/plotting.py:175-708) -----------


def test_plot_reference_line_update(rng):
    grid = pde.CartesianGrid([(0, 1)], 16)
    f1 = pde.ScalarField.random_uniform(grid, rng=rng)
    f2 = pde.ScalarField.random_uniform(grid, rng=rng)
    ref = f1.plot(kind="line")
    from pde_tpu.utils.plotting import PlotReference

    assert isinstance(ref, PlotReference)
    f2._update_plot(ref)
    np.testing.assert_allclose(ref.element.get_ydata(), np.asarray(f2.data))
    plt.close("all")


def test_plot_reference_image_update(rng):
    grid = pde.UnitGrid([8, 8])
    f1 = pde.ScalarField.random_uniform(grid, rng=rng)
    f2 = pde.ScalarField.random_uniform(grid, rng=rng)
    ref = f1.plot(kind="image")
    f2._update_plot(ref)
    np.testing.assert_allclose(
        np.asarray(ref.element.get_array()),
        np.asarray(f2.get_image_data()["data"]),
    )
    plt.close("all")


def test_plot_reference_collection_update(rng):
    grid = pde.UnitGrid([6, 6])
    fc1 = pde.FieldCollection(
        [pde.ScalarField.random_uniform(grid, rng=rng, label=l) for l in "ab"]
    )
    fc2 = pde.FieldCollection(
        [pde.ScalarField.random_uniform(grid, rng=rng, label=l) for l in "ab"]
    )
    refs = fc1.plot()
    fc2._update_plot(refs)
    plt.close("all")


def test_plot_tracker_reuses_figure(rng, tmp_path):
    """The tracker updates artists in place instead of re-creating figures."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    tracker = pde.PlotTracker(interrupts=0.02, show=False)
    eq = pde.DiffusionPDE(0.5)
    eq.solve(state, t_range=0.1, dt=0.01, tracker=tracker)
    assert tracker._plot_ref is not None  # live-update path engaged
    fig_count = len(plt.get_fignums())
    assert fig_count <= 2  # one reused figure (plus possible stragglers)
    plt.close("all")


def test_plot_on_axes_decorator(rng):
    from pde_tpu.utils.plotting import PlotReference, plot_on_axes

    class Thing:
        @plot_on_axes(update_method="_update_my_plot")
        def plot(self, ax, **kwargs):
            (line,) = ax.plot([0, 1], [0, 1])
            return line

        def _update_my_plot(self, reference):
            reference.element.set_ydata([1, 0])

    t = Thing()
    ref = t.plot(title="hello")
    assert isinstance(ref, PlotReference)
    assert ref.ax.get_title() == "hello"
    t.plot(action="update", ax=ref)
    np.testing.assert_allclose(ref.element.get_ydata(), [1, 0])
    with pytest.raises(TypeError):
        t.plot(action="update", ax=None)
    plt.close("all")


def test_plot_on_figure_decorator():
    from pde_tpu.utils.plotting import plot_on_figure

    class Panel:
        @plot_on_figure
        def plot(self, fig, **kwargs):
            ax = fig.add_subplot(111)
            ax.plot([0, 1])
            return fig

    ref = Panel().plot(title="panel")
    assert ref.parameters is not None
    plt.close("all")


def test_plotting_contexts():
    from pde_tpu.utils.plotting import (
        BasicPlottingContext,
        get_plotting_context,
        in_jupyter_notebook,
    )

    assert not in_jupyter_notebook()
    ctx = get_plotting_context(title="t")
    assert isinstance(ctx, BasicPlottingContext)
    with ctx:
        plt.plot([0, 1])
    assert ctx.fig is not None
    first_fig = ctx.fig
    with ctx:
        pass  # reuse
    assert ctx.fig is first_fig
    ctx.close()
    # passing an existing context returns it
    assert get_plotting_context(ctx) is ctx
    with pytest.raises(TypeError):
        get_plotting_context("nope")
    plt.close("all")
