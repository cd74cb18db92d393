"""Concrete trackers.

Reference: `/root/reference/pde/trackers/trackers.py:60-1006`.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Callable, IO

import numpy as np

from ..fields.base import FieldBase
from ..fields.datafield_base import DataFieldBase
from .base import FinishedSimulation, InfoDict, TrackerBase, TransformedTrackerBase
from .interrupts import ConstantInterrupts, RealtimeInterrupts


class CallbackTracker(TrackerBase):
    """Tracker calling a user function at each interrupt."""

    def __init__(self, func: Callable, interrupts=1, *, interval=None):
        super().__init__(interrupts=interrupts, interval=interval)
        self._callback = func
        import inspect

        self._num_args = len(
            [
                p
                for p in inspect.signature(func).parameters.values()
                if p.kind
                in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                and p.default is p.empty
            ]
        )

    def handle(self, field: FieldBase, t: float) -> None:
        if self._num_args == 1:
            self._callback(field)
        else:
            self._callback(field, t)


class ProgressTracker(TrackerBase):
    """Tracker showing a progress bar via tqdm."""

    name = "progress"

    def __init__(self, interrupts=None, *, fancy: bool = True, ndigits: int = 5,
                 leave: bool = True, interval=None):
        if interrupts is None:
            interrupts = RealtimeInterrupts(duration=1, dt_initial=1e-3)
        super().__init__(interrupts=interrupts, interval=interval)
        self.fancy = fancy
        self.ndigits = ndigits
        self.leave = leave
        self.progress_bar = None

    def initialize(self, field: FieldBase, info: InfoDict | None = None) -> float:
        from tqdm.auto import tqdm

        controller_info = (info or {}).get("controller", {})
        t_start = controller_info.get("t_start", 0)
        t_end = controller_info.get("t_end", 1)
        self._t_start = t_start
        self.progress_bar = tqdm(
            total=round(t_end - t_start, self.ndigits), leave=self.leave
        )
        self.progress_bar.set_description("Initializing")
        return super().initialize(field, info)

    def handle(self, field: FieldBase, t: float) -> None:
        if self.progress_bar is not None:
            progress = round(t - self._t_start, self.ndigits)
            self.progress_bar.n = min(progress, self.progress_bar.total)
            self.progress_bar.set_description("")
            self.progress_bar.refresh()

    def finalize(self, info: InfoDict | None = None) -> None:
        if self.progress_bar is not None:
            controller_info = (info or {}).get("controller", {})
            if controller_info.get("successful", True):
                self.progress_bar.n = self.progress_bar.total
            self.progress_bar.refresh()
            self.progress_bar.close()


class PrintTracker(TrackerBase):
    """Tracker printing field data to a stream."""

    name = "print"

    def __init__(self, interrupts=1, stream: IO[str] = sys.stdout, *, interval=None):
        super().__init__(interrupts=interrupts, interval=interval)
        self.stream = stream

    def handle(self, field: FieldBase, t: float) -> None:
        if isinstance(field, DataFieldBase):
            data = f"Field with average {complex(np.asarray(field.average)):g}".replace(
                "j", "i"
            ) if field.is_complex else f"Field with average {float(np.asarray(field.average)):g}"
        else:
            data = f"Collection with {len(field)} fields"  # type: ignore[arg-type]
        self.stream.write(f"t={t:g}, {data}\n")
        self.stream.flush()


class PlotTracker(TransformedTrackerBase):
    """Tracker plotting the state at interrupts (optionally writing files/movies)."""

    def __init__(
        self, interrupts=1, *, transformation=None, title="Time: {time:g}",
        output_file=None, movie=None, show=None, tight_layout=False,
        max_fps: float = np.inf, plot_args=None, interval=None,
    ):
        super().__init__(interrupts=interrupts, transformation=transformation,
                         interval=interval)
        self.title = title
        self.output_file = output_file
        self.movie = movie
        self.show = False if show is None else show
        self.tight_layout = tight_layout
        self.max_fps = max_fps
        self.plot_args = plot_args or {}
        self._figure = None
        self._plot_ref = None
        self._last_plot_time = -np.inf

    def initialize(self, state: FieldBase, info: InfoDict | None = None) -> float:
        import matplotlib.pyplot as plt

        self._plt = plt
        return super().initialize(state, info)

    def handle(self, state: FieldBase, t: float) -> None:
        if time.monotonic() - self._last_plot_time < 1 / self.max_fps:
            return
        state = self._transform(state, t)
        plt = self._plt
        title = (
            self.title.format(time=t)
            if isinstance(self.title, str)
            else self.title(state, t)
        )
        # live updates: re-use the figure and update the artists in place
        # (reference PlotReference machinery, `tools/plotting.py:175`)
        if self._plot_ref is not None:
            try:
                state._update_plot(self._plot_ref)
                self._figure.suptitle(title)
                self._finish_frame()
                return
            except (NotImplementedError, AttributeError, ValueError):
                self._plot_ref = None  # fall back to a full redraw
        if self._figure is not None:
            plt.close(self._figure)
        self._figure = plt.figure()
        if hasattr(state, "plot"):
            try:
                ref = state.plot(ax=self._figure.gca(), **self.plot_args)
            except TypeError:
                ref = state.plot(**self.plot_args)
                self._figure = plt.gcf()
            if hasattr(state, "_update_plot"):
                self._plot_ref = ref
        self._figure.suptitle(title)
        if self.tight_layout:
            self._figure.tight_layout()
        self._finish_frame()

    def _finish_frame(self) -> None:
        if self.output_file:
            self._figure.savefig(self.output_file)
        if self.show:
            self._plt.pause(0.001)
        self._last_plot_time = time.monotonic()

    def finalize(self, info: InfoDict | None = None) -> None:
        if self._figure is not None:
            self._plt.close(self._figure)


class LivePlotTracker(PlotTracker):
    """PlotTracker with defaults for live plotting."""

    name = "plot"

    def __init__(self, interrupts=1, *, show: bool = True, max_fps: float = 2, **kwargs):
        super().__init__(interrupts=interrupts, show=show, max_fps=max_fps, **kwargs)


class DataTracker(CallbackTracker):
    """Tracker storing function results over time; exports to pandas/files."""

    def __init__(self, func: Callable, interrupts=1, *, filename: str | None = None,
                 interval=None):
        super().__init__(func, interrupts=interrupts, interval=interval)
        self.filename = filename
        self.times: list[float] = []
        self.data: list[Any] = []

    def handle(self, field: FieldBase, t: float) -> None:
        self.times.append(t)
        if self._num_args == 1:
            self.data.append(self._callback(field))
        else:
            self.data.append(self._callback(field, t))

    @property
    def dataframe(self):
        import pandas as pd

        df = pd.DataFrame(self.data)
        df.insert(0, "time", self.times)
        return df

    def to_file(self, filename: str, **kwargs) -> None:
        ext = filename.split(".")[-1].lower()
        if ext == "pickle":
            import pickle

            with open(filename, "wb") as fp:
                pickle.dump((self.times, self.data), fp, **kwargs)
        elif ext == "csv":
            self.dataframe.to_csv(filename, **kwargs)
        elif ext in ("xls", "xlsx"):
            self.dataframe.to_excel(filename, **kwargs)
        else:
            raise ValueError(f"Unsupported file extension `.{ext}`")

    def finalize(self, info: InfoDict | None = None) -> None:
        super().finalize(info)
        if self.filename:
            self.to_file(self.filename)


class SteadyStateTracker(TrackerBase):
    """Tracker interrupting the simulation once the state is stationary."""

    name = "steady_state"
    progress_bar_format = (
        "Convergence: {n:.2g} of {total:.2g} {bar} [{elapsed}<{remaining}]"
    )

    def __init__(self, interrupts=None, atol: float = 1e-8, rtol: float = 1e-5, *,
                 progress: bool = False, evolution_rate=None, interval=None):
        if interrupts is None:
            interrupts = ConstantInterrupts(1)
        super().__init__(interrupts=interrupts, interval=interval)
        self.atol = atol
        self.rtol = rtol
        self.progress = progress
        self.evolution_rate = evolution_rate
        self._last_data = None

    def handle(self, field: FieldBase, t: float) -> None:
        if self.evolution_rate is not None:
            rate = self.evolution_rate(field, t)
            rate_data = np.concatenate(
                [np.ravel(np.asarray(x)) for x in _leaves(rate)]
            )
            ref = np.concatenate([np.ravel(np.asarray(x)) for x in _leaves(field)])
            if np.all(np.abs(rate_data) <= self.atol + self.rtol * np.abs(ref)):
                raise FinishedSimulation("Reached steady state")
            return
        data = [np.asarray(x) for x in _leaves(field)]
        if self._last_data is not None:
            dt = self.interrupts.dt or 1.0
            converged = all(
                np.allclose(a, b, atol=self.atol * dt, rtol=self.rtol * dt)
                for a, b in zip(data, self._last_data, strict=True)
            )
            if converged:
                raise FinishedSimulation("Reached steady state")
        self._last_data = data


class WalltimeTracker(TrackerBase):
    """Tracker recording the elapsed wall time in the diagnostics."""

    def __init__(self, interrupts=1, *, interval=None):
        super().__init__(interrupts=interrupts, interval=interval)

    def initialize(self, field: FieldBase, info: InfoDict | None = None) -> float:
        self._start = time.monotonic()
        self._info = info
        return super().initialize(field, info)

    def handle(self, field: FieldBase, t: float) -> None:
        if self._info is not None:
            self._info["profiler"] = self._info.get("profiler", {})
            self._info["profiler"]["walltime"] = time.monotonic() - self._start


class MaxRuntimeTracker(TrackerBase):
    """Tracker interrupting the simulation after a given wall time."""

    def __init__(self, max_runtime: float | str, interrupts=1, *, interval=None):
        super().__init__(interrupts=interrupts, interval=interval)
        if isinstance(max_runtime, str):
            from ..utils.parse_duration import parse_duration

            max_runtime = parse_duration(max_runtime).total_seconds()
        self.max_runtime = float(max_runtime)

    def initialize(self, field: FieldBase, info: InfoDict | None = None) -> float:
        self._t_start = time.monotonic()
        return super().initialize(field, info)

    def handle(self, field: FieldBase, t: float) -> None:
        if time.monotonic() - self._t_start > self.max_runtime:
            raise FinishedSimulation("Reached maximal runtime")


class RuntimeTracker(MaxRuntimeTracker):
    """Deprecated alias of :class:`MaxRuntimeTracker`."""


class ConsistencyTracker(TrackerBase):
    """Tracker aborting the simulation when the state becomes non-finite."""

    name = "consistency"

    def __init__(self, interrupts=None, *, interval=None):
        if interrupts is None:
            interrupts = ConstantInterrupts(1)
        super().__init__(interrupts=interrupts, interval=interval)

    def handle(self, field: FieldBase, t: float) -> None:
        for leaf in _leaves(field):
            if not np.all(np.isfinite(np.asarray(leaf))):
                raise StopIteration("Field was not finite")


class MaterialConservationTracker(TrackerBase):
    """Tracker that checks conservation of the total integral."""

    name = "material_conservation"

    def __init__(self, interrupts=1, atol: float = 1e-4, rtol: float = 1e-4, *,
                 interval=None):
        super().__init__(interrupts=interrupts, interval=interval)
        self.atol = atol
        self.rtol = rtol

    def initialize(self, field: FieldBase, info: InfoDict | None = None) -> float:
        from ..fields.collection import FieldCollection

        if isinstance(field, FieldCollection):
            self._reference = np.array([float(np.asarray(f.magnitude)) for f in field])
        else:
            self._reference = np.asarray(field.magnitude)  # type: ignore[union-attr]
        return super().initialize(field, info)

    def handle(self, field: FieldBase, t: float) -> None:
        from ..fields.collection import FieldCollection

        if isinstance(field, FieldCollection):
            mags = np.array([float(np.asarray(f.magnitude)) for f in field])
        else:
            mags = np.asarray(field.magnitude)  # type: ignore[union-attr]
        if not np.allclose(mags, self._reference, atol=self.atol, rtol=self.rtol):
            raise StopIteration("Material is not conserved")


def _leaves(field: FieldBase):
    import jax

    return jax.tree_util.tree_leaves(field)
