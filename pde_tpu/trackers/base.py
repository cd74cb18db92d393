"""Base classes for trackers.

Reference: `/root/reference/pde/trackers/base.py:39,131,190`.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable

from ..fields.base import FieldBase
from .interrupts import parse_interrupt

InfoDict = dict


class FinishedSimulation(StopIteration):
    """Exception signaling that the simulation finished successfully."""


class TrackerBase:
    """Base class for trackers that analyze the simulation state at interrupts."""

    _subclasses: dict[str, type[TrackerBase]] = {}
    name: str | None = None

    def __init__(self, interrupts=1, *, interval=None):
        if interval is not None:  # legacy alias
            interrupts = interval
        self.interrupts = parse_interrupt(interrupts)
        self._logger = logging.getLogger(self.__class__.__name__)

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if getattr(cls, "name", None):
            TrackerBase._subclasses[cls.name] = cls

    @classmethod
    def from_data(cls, data, **kwargs) -> TrackerBase:
        """Create a tracker from a string identifier or pass through instances."""
        if isinstance(data, TrackerBase):
            return data
        if callable(data):
            from .trackers import CallbackTracker

            return CallbackTracker(data, **kwargs)
        if isinstance(data, str):
            try:
                tracker_cls = cls._subclasses[data]
            except KeyError:
                raise ValueError(
                    f"Unknown tracker `{data}`; registered: "
                    f"{sorted(cls._subclasses)}"
                ) from None
            return tracker_cls(**kwargs)
        raise ValueError(f"Unsupported tracker format: `{data}`")

    def initialize(self, field: FieldBase, info: InfoDict | None = None) -> float:
        """Initialize the tracker; returns the first interrupt time."""
        return self.interrupts.initialize(0.0)

    def handle(self, field: FieldBase, t: float) -> None:
        """Analyze the field at time `t`."""

    def finalize(self, info: InfoDict | None = None) -> None:
        """Finalize the tracker after the simulation."""


class TransformedTrackerBase(TrackerBase):
    """Tracker that transforms the state before processing it."""

    def __init__(self, interrupts=1, *, transformation: Callable | None = None,
                 interval=None):
        super().__init__(interrupts=interrupts, interval=interval)
        if transformation is not None and not callable(transformation):
            raise TypeError("`transformation` must be callable")
        self.transformation = transformation

    def _transform(self, field: FieldBase, t: float) -> FieldBase:
        if self.transformation is None:
            return field
        try:
            return self.transformation(field, t)
        except TypeError:
            return self.transformation(field)


class TrackerCollection:
    """Collection of trackers sharing a simulation.

    Reference: `trackers/base.py:190`.
    """

    time_next_action: float

    def __init__(self, trackers: list[TrackerBase] | None = None):
        self.trackers = trackers or []
        self.time_next_action = math.inf
        self.times: list[float] = []

    def __len__(self) -> int:
        return len(self.trackers)

    def __iter__(self):
        return iter(self.trackers)

    @classmethod
    def from_data(cls, data, **kwargs) -> TrackerCollection:
        """Create a tracker collection from flexible data."""
        if data is None:
            return cls([])
        if data == "auto":
            trackers = []
            try:
                import tqdm  # noqa: F401

                from .trackers import ProgressTracker

                trackers.append(ProgressTracker())
            except ImportError:
                pass
            from .trackers import ConsistencyTracker

            trackers.append(ConsistencyTracker())
            return cls(trackers)
        if isinstance(data, TrackerCollection):
            return data
        if isinstance(data, (TrackerBase, str)) or callable(data):
            return cls([TrackerBase.from_data(data, **kwargs)])
        if hasattr(data, "__iter__"):
            return cls([TrackerBase.from_data(d, **kwargs) for d in data])
        raise ValueError(f"Cannot initialize trackers from `{data}`")

    def initialize(self, field: FieldBase, info: InfoDict | None = None) -> float:
        self.times = [t.initialize(field, info) for t in self.trackers]
        self.time_next_action = min(self.times, default=math.inf)
        return self.time_next_action

    def handle(self, state: FieldBase, t: float, atol: float = 1e-8) -> float:
        """Handle all trackers whose interrupt is due; returns next action time."""
        for i, tracker in enumerate(self.trackers):
            if t + atol >= self.times[i]:
                tracker.handle(state, t)
                self.times[i] = tracker.interrupts.next(t)
        self.time_next_action = min(self.times, default=math.inf)
        return self.time_next_action

    def finalize(self, info: InfoDict | None = None) -> None:
        for tracker in self.trackers:
            tracker.finalize(info)


def get_named_trackers() -> dict[str, type[TrackerBase]]:
    """All named trackers (importing the tracker module to register them)."""
    from . import trackers  # noqa: F401

    return dict(TrackerBase._subclasses)


def registered_trackers() -> list[str]:
    """Names of all registered trackers (reference `trackers/base.py:359`)."""
    return sorted(get_named_trackers())
