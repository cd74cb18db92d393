"""Trackers analyzing the simulation at interrupt times."""

from .base import (
    FinishedSimulation,
    TrackerBase,
    TrackerCollection,
    get_named_trackers,
    registered_trackers,
)
from .interrupts import (
    ConstantInterrupts,
    FixedInterrupts,
    GeometricInterrupts,
    InterruptsBase,
    LogarithmicInterrupts,
    RealtimeInterrupts,
    parse_interrupt,
)
from .trackers import (
    CallbackTracker,
    ConsistencyTracker,
    DataTracker,
    LivePlotTracker,
    MaterialConservationTracker,
    MaxRuntimeTracker,
    PlotTracker,
    PrintTracker,
    ProgressTracker,
    RuntimeTracker,
    SteadyStateTracker,
    WalltimeTracker,
)

try:
    from .interactive import InteractivePlotTracker
except ImportError:  # pragma: no cover — napari is optional
    pass
