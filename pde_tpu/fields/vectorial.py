"""Vector (rank-1) fields.

Reference: `/root/reference/pde/fields/vectorial.py:35`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grids.base import GridBase
from .base import FieldBase
from .datafield_base import DataFieldBase
from .scalar import ScalarField


class VectorField(DataFieldBase):
    """Vector field discretized on a grid."""

    rank = 1

    @classmethod
    def from_scalars(cls, fields, *, label: str | None = None, dtype=None) -> VectorField:
        """Combine scalar fields into a vector field."""
        grid = fields[0].grid
        if len(fields) != grid.dim:
            raise ValueError(f"Need {grid.dim} scalar fields, got {len(fields)}")
        for f in fields:
            grid.assert_grid_compatible(f.grid)
        data = jnp.stack([jnp.asarray(f.data) for f in fields])
        if dtype is not None:
            data = data.astype(dtype)
        return cls(grid, data=data, label=label)

    @classmethod
    def from_expression(
        cls, grid: GridBase, expressions, *, user_funcs=None, consts=None,
        label: str | None = None, dtype=None,
    ) -> VectorField:
        """Create a vector field from expressions for each component."""
        if isinstance(expressions, str) or len(expressions) != grid.dim:
            raise ValueError(f"Need {grid.dim} expressions for a vector field")
        scalars = [
            ScalarField.from_expression(
                grid, expr, user_funcs=user_funcs, consts=consts, dtype=dtype
            )
            for expr in expressions
        ]
        return cls.from_scalars(scalars, label=label, dtype=dtype)

    # -- algebra ---------------------------------------------------------------------------
    def dot(self, other, out=None, *, conjugate: bool = True, label: str = "dot product"):
        """Dot product with a vector or tensor field."""
        from .tensorial import Tensor2Field

        self.grid.assert_grid_compatible(other.grid)
        this = jnp.conjugate(self._data) if conjugate and self.is_complex else self._data
        if isinstance(other, VectorField):
            result = ScalarField(
                self.grid, data=jnp.einsum("i...,i...->...", this, other._data), label=label
            )
        elif isinstance(other, Tensor2Field):
            result = VectorField(
                self.grid, data=jnp.einsum("i...,ij...->j...", this, other._data), label=label
            )
        else:
            raise TypeError(f"Cannot calculate dot product with {other.__class__.__name__}")
        if out is not None:
            out._data = result._data
            return out
        return result

    __matmul__ = dot

    def outer_product(self, other: VectorField, out=None, *, label: str | None = None):
        """Outer product with another vector field, yielding a tensor field."""
        from .tensorial import Tensor2Field

        self.assert_field_compatible(other)
        data = jnp.einsum("i...,j...->ij...", self._data, other._data)
        result = Tensor2Field(self.grid, data=data, label=label)
        if out is not None:
            out._data = result._data
            return out
        return result

    def make_outer_prod_operator(self, backend: str = "jax"):
        """Return a function computing outer products of raw data arrays."""

        def outer(a, b, out=None):
            return jnp.einsum("i...,j...->ij...", a, b)

        return outer

    def make_dot_operator(self, backend: str = "jax", *, conjugate: bool = True):
        """Return a function computing dot products of raw data arrays."""
        if conjugate:

            def dot(a, b, out=None):
                return jnp.einsum("i...,i...->...", jnp.conjugate(a), b)

        else:

            def dot(a, b, out=None):
                return jnp.einsum("i...,i...->...", a, b)

        return dot

    # -- differential operators ---------------------------------------------------------------
    def divergence(self, bc, out=None, **kwargs) -> ScalarField:
        """Apply the divergence operator; returns a :class:`ScalarField`."""
        return self.apply_operator("divergence", bc=bc, out=out, **kwargs)

    def gradient(self, bc, out=None, **kwargs):
        """Apply the vector gradient; returns a :class:`Tensor2Field`."""
        return self.apply_operator("vector_gradient", bc=bc, out=out, **kwargs)

    def laplace(self, bc, out=None, **kwargs) -> VectorField:
        """Apply the vector Laplacian; returns a :class:`VectorField`."""
        return self.apply_operator("vector_laplace", bc=bc, out=out, **kwargs)

    # -- conversions -----------------------------------------------------------------------------
    def to_scalar(self, scalar: str = "auto", *, label: str | None = None) -> ScalarField:
        """Reduce the vector field to a scalar field."""
        if scalar == "auto" or scalar == "norm":
            data = jnp.linalg.norm(self._data, axis=0)
        elif scalar == "max":
            data = jnp.max(jnp.real(self._data), axis=0)
        elif scalar == "min":
            data = jnp.min(jnp.real(self._data), axis=0)
        elif scalar == "squared_sum":
            data = jnp.sum(self._data**2, axis=0)
        elif scalar == "norm_squared":
            data = jnp.sum(jnp.abs(self._data) ** 2, axis=0)
        elif isinstance(scalar, int):
            data = self._data[scalar]
        elif callable(scalar):
            data = scalar(self._data)
        else:
            raise ValueError(f"Unknown scalar conversion `{scalar}`")
        return ScalarField(self.grid, data=data, label=label)

    def __getitem__(self, key) -> ScalarField:
        """Extract a component as a scalar field."""
        if isinstance(key, str):
            key = self.grid.get_axis_index(key)
        return ScalarField(self.grid, data=self._data[key])

    def __setitem__(self, key, value):
        if isinstance(key, str):
            key = self.grid.get_axis_index(key)
        if isinstance(value, FieldBase):
            value = value.data
        self._data = self._data.at[key].set(jnp.asarray(value))

    # -- plotting -----------------------------------------------------------------------------------
    def get_vector_data(self, *, max_points=None, **kwargs):
        data = self.grid.get_vector_data(np.asarray(self._data), **kwargs)
        if max_points is not None:
            # subsample for quiver plots
            nx, ny = data["data_x"].shape
            sx = max(1, nx // max_points)
            sy = max(1, ny // max_points)
            data["x"] = data["x"][::sy] if data["x"].ndim else data["x"]
            data["data_x"] = data["data_x"][::sx, ::sy]
            data["data_y"] = data["data_y"][::sx, ::sy]
        data["title"] = self.label
        return data

    def _plot_vector(self, ax, *, method: str = "quiver", **kwargs):
        data = self.get_vector_data()
        if method == "quiver":
            return ax.quiver(data["x"], data["y"], data["data_x"], data["data_y"], **kwargs)
        if method == "streamplot":
            return ax.streamplot(
                np.asarray(data["x"]), np.asarray(data["y"]),
                np.asarray(data["data_x"]), np.asarray(data["data_y"]), **kwargs
            )
        raise ValueError(f"Unknown vector plot method `{method}`")

    def plot(self, kind: str = "auto", *args, **kwargs):
        if kind == "auto":
            kind = "vector" if self.grid.num_axes == 2 else "image"
        return super().plot(kind, *args, **kwargs)
