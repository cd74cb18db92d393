"""Boundary-condition pairs for a single grid axis.

Reference: `/root/reference/pde/grids/boundaries/axis.py:38,241,336`.
"""

from __future__ import annotations

from typing import Any

from ..base import GridBase, PeriodicityError
from .local import BCBase, BCDataError, _PeriodicBC


class BoundaryAxisBase:
    """Boundary conditions at both ends of one axis."""

    low: BCBase
    high: BCBase

    def __init__(self, low: BCBase, high: BCBase):
        if low.grid != high.grid:
            raise ValueError("Boundary conditions are not defined on the same grid")
        if low.axis != high.axis:
            raise ValueError("Boundary conditions are not defined for the same axis")
        if low.upper or not high.upper:
            raise ValueError("Order of boundary conditions is incorrect")
        self.low = low
        self.high = high

    @property
    def grid(self) -> GridBase:
        return self.low.grid

    @property
    def axis(self) -> int:
        return self.low.axis

    @property
    def rank(self) -> int:
        return self.low.rank

    @property
    def periodic(self) -> bool:
        return self.low.periodic

    def __iter__(self):
        yield self.low
        yield self.high

    def __getitem__(self, index):
        if index in (0, False):
            return self.low
        if index in (1, True):
            return self.high
        raise IndexError("Index must be 0/False (lower) or 1/True (upper)")

    def __eq__(self, other):
        if not isinstance(other, BoundaryAxisBase):
            return NotImplemented
        return self.low == other.low and self.high == other.high

    def __hash__(self):
        return hash((self.low, self.high))

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({self.low!r}, {self.high!r})"

    def _recreate(self, low: BCBase, high: BCBase) -> BoundaryAxisBase:
        """Build a compatible pair object from new local conditions.

        Subclasses with non-standard constructors (e.g. BoundaryPeriodic) fall
        back to a plain BoundaryPair — periodicity is carried by the local BCs.
        """
        return self.__class__(low, high)

    def copy(self) -> BoundaryAxisBase:
        return self._recreate(self.low.copy(), self.high.copy())

    def to_subgrid(self, subgrid: GridBase) -> BoundaryAxisBase:
        return self._recreate(
            self.low.to_subgrid(subgrid), self.high.to_subgrid(subgrid)
        )

    def get_mathematical_representation(self, field_name: str = "C"):
        return (
            self.low.get_mathematical_representation(field_name),
            self.high.get_mathematical_representation(field_name),
        )

    def make_ghost_setter(self):
        """Pure function setting ghost layers on both sides of this axis."""
        set_low = self.low.make_ghost_setter()
        set_high = self.high.make_ghost_setter()

        def setter(full, t=0.0, args=None):
            return set_high(set_low(full, t, args), t, args)

        return setter


class BoundaryPair(BoundaryAxisBase):
    """Represents the two non-periodic boundaries of one axis."""

    @classmethod
    def from_data(cls, grid: GridBase, axis: int, data, *, rank: int = 0) -> BoundaryPair:
        if isinstance(data, BoundaryAxisBase):
            return cls(data.low.copy(), data.high.copy())
        if isinstance(data, dict) and ("low" in data or "high" in data):
            data = dict(data)
            low = data.pop("low")
            high = data.pop("high")
            if data:
                raise BCDataError(f"Unexpected keys in BC data: {list(data)}")
            return cls(
                BCBase.from_data(grid, axis, False, low, rank=rank),
                BCBase.from_data(grid, axis, True, high, rank=rank),
            )
        if isinstance(data, (tuple, list)) and len(data) == 2:
            return cls(
                BCBase.from_data(grid, axis, False, data[0], rank=rank),
                BCBase.from_data(grid, axis, True, data[1], rank=rank),
            )
        # one condition for both sides
        return cls(
            BCBase.from_data(grid, axis, False, data, rank=rank),
            BCBase.from_data(grid, axis, True, data, rank=rank),
        )


class BoundaryPeriodic(BoundaryPair):
    """Represents the two periodic boundaries of one axis."""

    def __init__(self, grid: GridBase, axis: int, flip_sign: bool = False, *, rank: int = 0):
        low = _PeriodicBC(grid, axis, upper=False, flip_sign=flip_sign, rank=rank)
        high = _PeriodicBC(grid, axis, upper=True, flip_sign=flip_sign, rank=rank)
        super().__init__(low, high)

    @property
    def flip_sign(self) -> bool:
        return self.low.flip_sign  # type: ignore[union-attr]

    def _recreate(self, low, high) -> BoundaryPair:
        # constructor signature differs; periodicity is carried by the local BCs
        return BoundaryPair(low, high)


def get_boundary_axis(grid: GridBase, axis: int, data, *, rank: int = 0) -> BoundaryAxisBase:
    """Return the BoundaryAxisBase for one axis from flexible data."""
    if data is None:
        data = "auto_periodic_neumann"
    if isinstance(data, BoundaryAxisBase):
        if data.grid != grid or data.axis != axis:
            data = BoundaryPair(
                data.low.copy_for(grid, axis, False, rank=rank),
                data.high.copy_for(grid, axis, True, rank=rank),
            )
        return data
    if isinstance(data, str):
        if data in ("periodic", "anti-periodic"):
            if not grid.periodic[axis]:
                raise PeriodicityError(
                    f"Axis {grid.axes[axis]} is not periodic; cannot use periodic BCs"
                )
            return BoundaryPeriodic(grid, axis, flip_sign=(data == "anti-periodic"), rank=rank)
        if data.startswith("auto_periodic_"):
            if grid.periodic[axis]:
                return BoundaryPeriodic(grid, axis, rank=rank)
            kind = data[len("auto_periodic_") :]
            kind = {"neumann": "derivative", "dirichlet": "value", "curvature": "curvature"}.get(kind, kind)
            data = kind
        elif data == "natural":
            if grid.periodic[axis]:
                return BoundaryPeriodic(grid, axis, rank=rank)
            data = "derivative"
    if grid.periodic[axis]:
        # periodic axes only support periodic conditions
        if isinstance(data, (tuple, list)) and len(data) == 2 and all(
            d in ("periodic", "anti-periodic") for d in data
        ):
            if data[0] != data[1]:
                raise PeriodicityError("Both sides of a periodic axis must match")
            data = data[0]
            return BoundaryPeriodic(grid, axis, flip_sign=(data == "anti-periodic"), rank=rank)
        raise PeriodicityError(
            f"Axis {grid.axes[axis]} is periodic; only 'periodic' or 'anti-periodic' "
            f"boundary conditions are allowed (got `{data}`)"
        )
    return BoundaryPair.from_data(grid, axis, data, rank=rank)
