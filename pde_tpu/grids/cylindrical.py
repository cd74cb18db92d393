"""Cylindrical grid with axial (angular) symmetry.

TPU-native equivalent of `/root/reference/pde/grids/cylindrical.py:30`: a 2D
(r, z) grid embedded in 3D space. Vector/tensor components are ordered
(r, z, φ), matching the reference convention
(`backends/numba/operators/cylindrical_sym.py:268`).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import numpy as np

from .base import DimensionError, GridBase, _check_shape, discretize_interval
from .coordinates import CylindricalCoordinates


class CylindricalSymGrid(GridBase):
    """3D cylindrical grid assuming angular symmetry."""

    axes = ["r", "z"]
    boundary_names = {
        "inner": (0, False),
        "outer": (0, True),
        "bottom": (1, False),
        "top": (1, True),
    }

    def __init__(self, radius, bounds_z, shape, periodic_z: bool = False):
        self.c = CylindricalCoordinates()
        self.axes = ["r", "z"]
        super().__init__()
        shape_list = _check_shape(shape)
        if len(shape_list) == 1:
            self._shape = (shape_list[0], shape_list[0])
        elif len(shape_list) == 2:
            self._shape = tuple(shape_list)  # type: ignore[assignment]
        else:
            raise DimensionError("`shape` must be (N_r, N_z)")
        try:
            r_inner, r_outer = radius  # type: ignore[misc]
        except TypeError:
            r_inner, r_outer = 0.0, float(radius)
        if r_inner < 0:
            raise ValueError("Inner radius must be positive")
        if r_inner >= r_outer:
            raise ValueError("Outer radius must be larger than inner radius")
        bounds_z = tuple(bounds_z)  # type: ignore[assignment]
        if len(bounds_z) != 2:
            raise ValueError("`bounds_z` must be (z_min, z_max)")

        rs, dr = discretize_interval(float(r_inner), float(r_outer), self._shape[0])
        zs, dz = discretize_interval(float(bounds_z[0]), float(bounds_z[1]), self._shape[1])
        self._axes_coords = (rs, zs)
        self._axes_bounds = (
            (float(r_inner), float(r_outer)),
            (float(bounds_z[0]), float(bounds_z[1])),
        )
        self._discretization = np.array((dr, dz))
        self._periodic = [False, bool(periodic_z)]

    @property
    def state(self) -> dict[str, Any]:
        return {
            "radius": self.radius,
            "bounds_z": self.axes_bounds[1],
            "shape": self.shape,
            "periodic_z": self.periodic[1],
        }

    @classmethod
    def from_state(cls, state: dict[str, Any]) -> CylindricalSymGrid:
        state = dict(state)
        state.pop("class", None)
        radius = state.pop("radius")
        if isinstance(radius, list):
            radius = tuple(radius)
        return cls(
            radius=radius,
            bounds_z=state.pop("bounds_z"),
            shape=state.pop("shape"),
            periodic_z=state.pop("periodic_z", False),
        )

    @classmethod
    def from_bounds(cls, bounds, shape, periodic=(False, False)):
        if len(bounds) != 2:
            raise ValueError("`bounds` must be ((r_min, r_max), (z_min, z_max))")
        return cls(tuple(bounds[0]), bounds[1], shape, periodic_z=bool(periodic[1]))

    @property
    def has_hole(self) -> bool:
        return self.axes_bounds[0][0] > 0

    @property
    def radius(self):
        r_inner, r_outer = self.axes_bounds[0]
        return r_outer if r_inner == 0 else (r_inner, r_outer)

    @property
    def length(self) -> float:
        z_min, z_max = self.axes_bounds[1]
        return z_max - z_min

    @property
    def volume(self) -> float:
        r_inner, r_outer = self.axes_bounds[0]
        return float(np.pi * (r_outer**2 - r_inner**2) * self.length)

    @property
    def cell_volumes(self) -> np.ndarray:
        dr, dz = self.discretization
        rs = self.axes_coords[0]
        ring_areas = np.pi * ((rs + dr / 2) ** 2 - (rs - dr / 2) ** 2)
        return np.outer(ring_areas, np.full(self.shape[1], dz))

    @functools.cached_property
    def _axis_volume_factors(self):
        dr, dz = self.discretization
        rs = self.axes_coords[0]
        ring_areas = np.pi * ((rs + dr / 2) ** 2 - (rs - dr / 2) ** 2)
        return [ring_areas, np.full(self.shape[1], dz)]

    def get_cartesian_grid(self, mode: str = "valid", num: int | None = None):
        """Return a 3D Cartesian grid covering this cylindrical grid.

        Reference `/root/reference/pde/grids/cylindrical.py:399`: 'valid'
        inscribes the xy-square in the circular cross-section; 'full'
        circumscribes it. The z axis is carried over unchanged.
        """
        from .cartesian import CartesianGrid

        r_outer = self.axes_bounds[0][1]
        if mode in ("valid", "inscribed"):
            bound = r_outer / np.sqrt(2)
        elif mode in ("full", "circumscribed"):
            bound = r_outer
        else:
            raise ValueError(f"Unsupported mode `{mode}`")
        z_lo, z_hi = self.axes_bounds[1]
        if num is None:
            nums = [
                round(2 * bound / self.discretization[0]),
                round(2 * bound / self.discretization[0]),
                self.shape[1],
            ]
        else:
            nums = [num, num, num]
        return CartesianGrid(
            [(-bound, bound), (-bound, bound), (z_lo, z_hi)], nums
        )

    def _coords_symmetric(self, points):
        # (r, φ, z) -> (r, z)
        return points[..., [0, 2]]

    def _coords_full(self, points, value="min"):
        # (r, z) -> (r, φ=0, z)
        r = points[..., :1]
        z = points[..., 1:2]
        phi = np.zeros_like(r)
        return np.concatenate([r, phi, z], axis=-1)

    def get_line_data(self, data, extract: str = "auto") -> dict[str, Any]:
        data = np.asarray(data)
        if extract in ("auto", "cut_axial", "cut_z"):
            # data along the axial direction at r=min
            return {
                "data_x": self.axes_coords[1],
                "data_y": data[0],
                "extent_x": self.axes_bounds[1],
                "label_x": "z",
            }
        if extract in ("cut_r", "cut_radial"):
            return {
                "data_x": self.axes_coords[0],
                "data_y": data[:, self.shape[1] // 2],
                "extent_x": self.axes_bounds[0],
                "label_x": "r",
            }
        if extract == "project_z":
            data_y = np.asarray(self.integrate(data, axes=0))
            return {
                "data_x": self.axes_coords[1],
                "data_y": data_y,
                "label_x": "z",
            }
        if extract == "project_r":
            data_y = np.asarray(self.integrate(data, axes=1))
            return {
                "data_x": self.axes_coords[0],
                "data_y": data_y,
                "label_x": "r",
            }
        raise ValueError(f"Unknown extraction method `{extract}`")

    def get_image_data(self, data, **kwargs) -> dict[str, Any]:
        """(r, z) data displayed as an image with r horizontal, z vertical."""
        data = np.asarray(data)
        r_inner, r_outer = self.axes_bounds[0]
        z_min, z_max = self.axes_bounds[1]
        # mirror the radial direction for a full cross-section
        image = np.concatenate([data[::-1], data], axis=0)
        return {
            "data": image.T,
            "x": np.r_[-self.axes_coords[0][::-1], self.axes_coords[0]],
            "y": self.axes_coords[1],
            "extent": [-r_outer, r_outer, z_min, z_max],
            "label_x": "r",
            "label_y": "z",
        }

    def plot(self, *args, **kwargs):
        """Visualize the grid as its (r, z) cross-section."""
        import matplotlib.pyplot as plt

        import numpy as _np

        fig, ax = plt.subplots()
        (r0, r1), (z0, z1) = self.axes_bounds
        for r in _np.linspace(r0, r1, self.shape[0] + 1):
            ax.axvline(r, color="k", lw=0.5)
        for z in _np.linspace(z0, z1, self.shape[1] + 1):
            ax.axhline(z, color="k", lw=0.5)
        ax.set_xlim(r0, r1)
        ax.set_ylim(z0, z1)
        ax.set_xlabel("r")
        ax.set_ylabel("z")
        return ax

    def slice(self, indices: Sequence[int]):
        """Return a subgrid for the given axes (r -> polar, z -> Cartesian)."""
        from .cartesian import CartesianGrid
        from .spherical import PolarSymGrid

        indices = [self.get_axis_index(i) for i in indices]
        if indices == [0]:
            return PolarSymGrid(self.axes_bounds[0][1] if not self.has_hole else self.axes_bounds[0], self.shape[0])
        if indices == [1]:
            return CartesianGrid([self.axes_bounds[1]], [self.shape[1]],
                                 periodic=[self.periodic[1]])
        raise ValueError(f"Cannot slice cylindrical grid with indices {indices}")
