"""Scalar (rank-0) fields.

Reference: `/root/reference/pde/fields/scalar.py:29`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..grids.base import GridBase
from ..grids.cartesian import CartesianGrid
from .datafield_base import DataFieldBase


class ScalarField(DataFieldBase):
    """Scalar field discretized on a grid."""

    rank = 0

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        """Support numpy ufuncs on fields: ``np.sin(field)``, ``np.add(f, 2)``.

        Reference: `fields/scalar.py:161`. The ufunc is lowered to its
        :mod:`jax.numpy` equivalent so the call stays traceable under jit
        (fields hold jax arrays, possibly tracers); ``out=`` targets receive
        the computed data via their ``.data`` setter.
        """
        import numbers

        if method != "__call__":
            return NotImplemented
        if ufunc.nout != 1:
            # np.divmod/np.modf/np.frexp would produce a field whose .data is
            # a tuple; fall back to numpy's default handling instead
            return NotImplemented
        jnp_func = getattr(jnp, ufunc.__name__, None)
        if jnp_func is None:
            return NotImplemented
        arrs = []
        for arg in inputs:
            if isinstance(arg, numbers.Number):
                arrs.append(arg)
            elif isinstance(arg, (np.ndarray, jnp.ndarray)):
                if arg.shape not in ((), self.data.shape):
                    raise RuntimeError(
                        f"Data shapes incompatible ({arg.shape} != {self.data.shape})"
                    )
                arrs.append(arg)
            elif isinstance(arg, self.__class__):
                self.assert_field_compatible(arg)
                arrs.append(arg.data)
            else:
                return NotImplemented
        out = kwargs.pop("out", None)
        if kwargs:  # unsupported ufunc kwargs like `where`
            return NotImplemented
        data = jnp_func(*arrs)
        if out is not None:
            if len(out) != 1:
                return NotImplemented
            out_field = out[0]
            self.assert_field_compatible(out_field)
            out_field.data = data
            return out_field
        return self.__class__(self.grid, data=data)

    @classmethod
    def from_expression(
        cls, grid: GridBase, expression: str, *, user_funcs=None, consts=None,
        label: str | None = None, dtype=None,
    ) -> ScalarField:
        """Create a scalar field from a mathematical expression of the coordinates.

        On curvilinear grids the Cartesian coordinates of each cell are
        available as ``cartesian[i]`` (reference `fields/scalar.py:75`).
        """
        from ..utils.expressions import ScalarExpression

        if "cartesian" in str(expression):
            consts = dict(consts or {})
            if "cartesian" not in consts:
                coords_cart = grid.point_to_cartesian(grid.cell_coords)
                consts["cartesian"] = np.moveaxis(coords_cart, -1, 0)

        expr = ScalarExpression(
            expression,
            signature=grid.axes,
            user_funcs=user_funcs,
            consts=consts,
            allow_indexed=True,
        )
        coords = [np.asarray(c) for c in grid.coordinate_arrays]
        values = np.broadcast_to(expr(*coords), grid.shape)
        return cls(grid, data=jnp.asarray(values, dtype=dtype), label=label)

    @classmethod
    def from_image(cls, path, bounds=None, periodic=False, *, label=None) -> ScalarField:
        """Create a scalar field from a grayscale image file."""
        import matplotlib.pyplot as plt

        img = plt.imread(path)
        if img.ndim == 3:
            img = img[..., :3].mean(axis=-1)  # convert RGB(A) to luminance
        data = img.T[:, ::-1]  # convert to (x, y) index order
        if bounds is None:
            grid = CartesianGrid(
                [(0, data.shape[0]), (0, data.shape[1])], data.shape, periodic=periodic
            )
        else:
            grid = CartesianGrid(bounds, data.shape, periodic=periodic)
        return cls(grid, data=jnp.asarray(np.ascontiguousarray(data)), label=label)

    # -- differential operators ----------------------------------------------------------
    def laplace(self, bc, out=None, **kwargs):
        """Apply the Laplace operator; returns a :class:`ScalarField`."""
        return self.apply_operator("laplace", bc=bc, out=out, **kwargs)

    def gradient(self, bc, out=None, **kwargs):
        """Apply the gradient operator; returns a :class:`VectorField`."""
        return self.apply_operator("gradient", bc=bc, out=out, **kwargs)

    def gradient_squared(self, bc, out=None, **kwargs):
        """Squared gradient magnitude; returns a :class:`ScalarField`."""
        return self.apply_operator("gradient_squared", bc=bc, out=out, **kwargs)

    # -- scalar conversions ------------------------------------------------------------------
    def to_scalar(self, scalar: str = "auto", *, label: str | None = None) -> ScalarField:
        if scalar == "auto":
            # unchanged copy for real fields; norm for complex ones (ref scalar.py:452)
            data = jnp.abs(self._data) if self.is_complex else self._data
        elif scalar == "abs" or scalar == "norm":
            data = jnp.abs(self._data)
        elif scalar == "real":
            data = jnp.real(self._data)
        elif scalar == "imag":
            data = jnp.imag(self._data)
        elif scalar == "norm_squared" or scalar == "squared_sum":
            data = jnp.abs(self._data) ** 2
        elif callable(scalar):
            data = scalar(self._data)
        else:
            raise ValueError(f"Unknown scalar conversion `{scalar}`")
        return ScalarField(self.grid, data=data, label=label)

    # -- geometry -----------------------------------------------------------------------------
    def project(self, axes, method: str = "integral", *, label: str | None = None) -> ScalarField:
        """Project the field by integrating over the given axes (Cartesian grids)."""
        if isinstance(axes, (str, int)):
            axes = [axes]
        axes_idx = sorted(self.grid.get_axis_index(a) for a in axes)
        if not isinstance(self.grid, CartesianGrid):
            raise NotImplementedError("Projection requires a Cartesian grid")
        remaining = [a for a in range(self.grid.num_axes) if a not in axes_idx]
        if not remaining:
            raise ValueError("Cannot project out all axes")
        subgrid = self.grid.slice(remaining)
        if method == "max":
            data = jnp.max(self._data, axis=tuple(axes_idx))
        elif method == "min":
            data = jnp.min(self._data, axis=tuple(axes_idx))
        elif method in ("integral", "average", "mean"):
            data = self.grid.integrate(self._data, axes=axes_idx)
            if method != "integral":
                volume = np.prod(
                    [self.grid.axes_bounds[a][1] - self.grid.axes_bounds[a][0] for a in axes_idx]
                )
                data = data / volume
        else:
            raise ValueError(f"Unknown projection method `{method}`")
        return ScalarField(subgrid, data=data, label=label or self.label)

    def slice(self, position: dict[str, float], *, method: str = "nearest",
              label: str | None = None) -> ScalarField:
        """Extract a slice at fixed positions of some axes (Cartesian grids)."""
        if not isinstance(self.grid, CartesianGrid):
            raise NotImplementedError("Slicing requires a Cartesian grid")
        if method != "nearest":
            raise ValueError(f"Unknown slicing method `{method}`")
        fixed = {self.grid.get_axis_index(k): v for k, v in position.items()}
        remaining = [a for a in range(self.grid.num_axes) if a not in fixed]
        if not remaining:
            raise ValueError("Cannot slice out all axes")
        subgrid = self.grid.slice(remaining)
        idx: list[Any] = [slice(None)] * self.grid.num_axes
        for ax, pos in fixed.items():
            lo, hi = self.grid.axes_bounds[ax]
            if not lo <= pos <= hi:
                raise ValueError(f"Slice position {pos} outside axis bounds [{lo}, {hi}]")
            idx[ax] = int(
                np.argmin(np.abs(np.asarray(self.grid.axes_coords[ax]) - pos))
            )
        return ScalarField(subgrid, data=self._data[tuple(idx)], label=label or self.label)

    def get_boundary_field(self, index, bc=None, *, label: str | None = None) -> ScalarField:
        """Field of boundary values on the boundary grid (reference `scalar.py:524`)."""
        axis, upper = self.grid._get_boundary_index(index)
        values = self.get_boundary_values(axis, upper, bc)
        if self.grid.num_axes == 1:
            # 0-d boundary: return plain value wrapped in 1-cell grid
            from ..grids.cartesian import UnitGrid

            grid = UnitGrid([1])
            return ScalarField(grid, data=jnp.reshape(values, (1,)), label=label)
        if isinstance(self.grid, CartesianGrid):
            remaining = [a for a in range(self.grid.num_axes) if a != axis]
            subgrid = self.grid.slice(remaining)
            return ScalarField(subgrid, data=values, label=label)
        raise NotImplementedError("Boundary fields require Cartesian grids")
