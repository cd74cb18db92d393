"""Grids — static geometry metadata for fields and operators."""

from .base import (
    DomainError,
    GridBase,
    OperatorInfo,
    PeriodicityError,
    discretize_interval,
    registered_operators,
)
from .boundaries import BoundariesBase, BoundariesList, BoundariesSetter, set_default_bc
from .cartesian import CartesianGrid, UnitGrid

try:
    from .spherical import PolarSymGrid, SphericalSymGrid
except ImportError:  # pragma: no cover — during incremental bootstrap
    pass
try:
    from .cylindrical import CylindricalSymGrid
except ImportError:  # pragma: no cover
    pass
