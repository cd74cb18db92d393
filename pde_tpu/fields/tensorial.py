"""Rank-2 tensor fields.

Reference: `/root/reference/pde/fields/tensorial.py:29`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..grids.base import GridBase
from .base import FieldBase
from .datafield_base import DataFieldBase
from .scalar import ScalarField
from .vectorial import VectorField


class Tensor2Field(DataFieldBase):
    """Rank-2 tensor field discretized on a grid."""

    rank = 2

    @classmethod
    def from_expression(
        cls, grid: GridBase, expressions, *, user_funcs=None, consts=None,
        label: str | None = None, dtype=None,
    ) -> Tensor2Field:
        """Create a tensor field from a nested list of component expressions."""
        dim = grid.dim
        if len(expressions) != dim or any(len(row) != dim for row in expressions):
            raise ValueError(f"Need a {dim}x{dim} matrix of expressions")
        rows = []
        for row in expressions:
            comps = [
                ScalarField.from_expression(
                    grid, e, user_funcs=user_funcs, consts=consts, dtype=dtype
                ).data
                for e in row
            ]
            rows.append(jnp.stack(comps))
        return cls(grid, data=jnp.stack(rows), label=label)

    # -- algebra -------------------------------------------------------------------------------
    def dot(self, other, out=None, *, conjugate: bool = True, label: str = "dot product"):
        """Dot product with a vector or tensor field."""
        self.grid.assert_grid_compatible(other.grid)
        this = jnp.conjugate(self._data) if conjugate and self.is_complex else self._data
        if isinstance(other, VectorField):
            result = VectorField(
                self.grid, data=jnp.einsum("ij...,j...->i...", this, other._data), label=label
            )
        elif isinstance(other, Tensor2Field):
            result = Tensor2Field(
                self.grid, data=jnp.einsum("ij...,jk...->ik...", this, other._data), label=label
            )
        else:
            raise TypeError(f"Cannot calculate dot product with {other.__class__.__name__}")
        if out is not None:
            out._data = result._data
            return out
        return result

    __matmul__ = dot

    def make_dot_operator(self, backend: str = "jax", *, conjugate: bool = True):
        if conjugate:

            def dot(a, b, out=None):
                a = jnp.conjugate(a)
                if b.ndim == a.ndim:  # tensor @ tensor
                    return jnp.einsum("ij...,jk...->ik...", a, b)
                return jnp.einsum("ij...,j...->i...", a, b)

        else:

            def dot(a, b, out=None):
                if b.ndim == a.ndim:
                    return jnp.einsum("ij...,jk...->ik...", a, b)
                return jnp.einsum("ij...,j...->i...", a, b)

        return dot

    # -- tensor structure ---------------------------------------------------------------------
    @property
    def transpose(self):
        """Deprecated property-style access kept for parity; use :meth:`transposed`."""
        return self.transposed()

    def transposed(self, *, label: str | None = None) -> Tensor2Field:
        return Tensor2Field(
            self.grid, data=jnp.swapaxes(self._data, 0, 1), label=label or self.label
        )

    def symmetrize(self, make_traceless: bool = False, inplace: bool = False) -> Tensor2Field:
        """Symmetrize the tensor field (optionally making it traceless)."""
        data = 0.5 * (self._data + jnp.swapaxes(self._data, 0, 1))
        if make_traceless:
            dim = self.grid.dim
            tr = jnp.einsum("ii...->...", data) / dim
            eye = jnp.eye(dim).reshape((dim, dim) + (1,) * self.grid.num_axes)
            data = data - eye * tr
        if inplace:
            self._data = data
            return self
        return Tensor2Field(self.grid, data=data, label=self.label)

    def trace(self, label: str | None = None) -> ScalarField:
        """Trace of the tensor field as a scalar field."""
        return ScalarField(self.grid, data=jnp.einsum("ii...->...", self._data), label=label)

    # -- differential operators ------------------------------------------------------------------
    def divergence(self, bc, out=None, **kwargs) -> VectorField:
        """Apply the tensor divergence; returns a :class:`VectorField`."""
        return self.apply_operator("tensor_divergence", bc=bc, out=out, **kwargs)

    def double_divergence(self, bc, out=None, **kwargs) -> ScalarField:
        """Apply the tensor double divergence; returns a :class:`ScalarField`."""
        return self.apply_operator("tensor_double_divergence", bc=bc, out=out, **kwargs)

    # -- conversions ---------------------------------------------------------------------------------
    def to_scalar(self, scalar: str = "auto", *, label: str | None = None) -> ScalarField:
        """Reduce the tensor field to a scalar field."""
        if scalar == "auto" or scalar == "norm":
            data = jnp.linalg.norm(jnp.abs(self._data), axis=(0, 1))
        elif scalar == "min":
            data = jnp.min(jnp.real(self._data), axis=(0, 1))
        elif scalar == "max":
            data = jnp.max(jnp.real(self._data), axis=(0, 1))
        elif scalar == "squared_sum":
            data = jnp.sum(self._data**2, axis=(0, 1))
        elif scalar == "norm_squared":
            data = jnp.sum(jnp.abs(self._data) ** 2, axis=(0, 1))
        elif scalar == "trace" or scalar == "invariant1":
            data = jnp.einsum("ii...->...", self._data)
        elif scalar == "invariant2":
            tr = jnp.einsum("ii...->...", self._data)
            sq = jnp.einsum("ij...,ji...->...", self._data, self._data)
            data = 0.5 * (tr**2 - sq)
        elif scalar in ("determinant", "invariant3"):
            # move tensor axes last for batched det
            moved = jnp.moveaxis(self._data, (0, 1), (-2, -1))
            data = jnp.linalg.det(moved)
        elif callable(scalar):
            data = scalar(self._data)
        else:
            raise ValueError(f"Unknown scalar conversion `{scalar}`")
        return ScalarField(self.grid, data=data, label=label)

    def __getitem__(self, key) -> ScalarField:
        """Extract a component as a scalar field."""
        i, j = key
        if isinstance(i, str):
            i = self.grid.get_axis_index(i)
        if isinstance(j, str):
            j = self.grid.get_axis_index(j)
        return ScalarField(self.grid, data=self._data[i, j])

    def __setitem__(self, key, value):
        i, j = key
        if isinstance(i, str):
            i = self.grid.get_axis_index(i)
        if isinstance(j, str):
            j = self.grid.get_axis_index(j)
        if isinstance(value, FieldBase):
            value = value.data
        self._data = self._data.at[i, j].set(jnp.asarray(value))

    def plot_components(self, kind: str = "auto", *args, **kwargs):
        """Plot all tensor components in a grid of panels."""
        import matplotlib.pyplot as plt

        dim = self.grid.dim
        fig, axes = plt.subplots(dim, dim, figsize=(4 * dim, 4 * dim))
        refs = []
        for i in range(dim):
            for j in range(dim):
                comp = self[i, j]
                comp._label = f"{self.label or 'tensor'}[{i},{j}]"
                refs.append(comp.plot(kind, *args, ax=np.atleast_2d(axes)[i][j], **kwargs))
        return refs
