"""Local boundary conditions — one side of one axis.

TPU-native re-design of the reference local BC layer
(`/root/reference/pde/grids/boundaries/local.py:148`). Each condition knows how
to compute the *virtual point* (ghost-cell value) just outside the boundary from
the field values inside. Instead of mutating a ``_data_full`` buffer, every BC
builds a **pure ghost setter** ``setter(full, t, args) -> full`` using
functional updates, which XLA fuses into the surrounding stencil.

Virtual-point formulas (1st order, reference `local.py:1541-1941`):
    ghost = const + factor * data[edge]
with (const, factor):
    * Dirichlet value v:  (2v, -1)
    * Neumann deriv d:    (d*dx, +1)
    * Robin ∂c+γc=β:      (2dxβ/(2+dxγ), (2-dxγ)/(2+dxγ)); γ→∞ gives (0, -1)
2nd order (curvature v): ghost = v*dx² + 2*data[i1] - data[i2]
"""

from __future__ import annotations

import numbers
from typing import Any, Callable

import numpy as np

from ..base import GridBase, PeriodicityError


class BCDataError(ValueError):
    """Exception indicating that given boundary data could not be interpreted."""


def _hash_value(value) -> Any:
    if isinstance(value, np.ndarray):
        return (value.shape, value.tobytes())
    return value


class BCBase:
    """Represents a single boundary condition on one side of one axis."""

    names: list[str] = []
    normal: bool = False
    homogeneous: bool = True

    _subclasses: dict[str, type[BCBase]] = {}
    _conditions: dict[str, type[BCBase]] = {}

    def __init__(self, grid: GridBase, axis: int, upper: bool, *, rank: int = 0):
        self.grid = grid
        self.axis = axis
        self.upper = upper
        self.rank = rank
        if self.rank == 0:
            self.normal = False
        if self.normal:
            self._shape_tensor = (self.grid.dim,) * (self.rank - 1)
        else:
            self._shape_tensor = (self.grid.dim,) * self.rank
        self._shape_boundary = (
            self.grid.shape[: self.axis] + self.grid.shape[self.axis + 1 :]
        )

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BCBase._subclasses[cls.__name__] = cls
        for name in cls.names:
            BCBase._conditions[name] = cls

    # -- basic properties --------------------------------------------------------
    @property
    def periodic(self) -> bool:
        return isinstance(self, _PeriodicBC)

    @property
    def axis_coord(self) -> float:
        """Coordinate of the boundary along its axis."""
        return self.grid.axes_bounds[self.axis][1 if self.upper else 0]

    def _repr_value(self):
        return []

    def __repr__(self) -> str:
        fields = [f"axis={self.axis}", f"upper={self.upper}"] + self._repr_value()
        return f"{self.__class__.__name__}({', '.join(fields)})"

    def __eq__(self, other) -> bool:
        if not isinstance(other, BCBase):
            return NotImplemented
        return (
            self.__class__ is other.__class__
            and self.grid == other.grid
            and self.axis == other.axis
            and self.upper == other.upper
            and self.rank == other.rank
            and self._value_key() == other._value_key()
        )

    def __hash__(self) -> int:
        return hash(
            (
                self.__class__.__name__,
                self.grid,
                self.axis,
                self.upper,
                self.rank,
                self._value_key(),
            )
        )

    def _value_key(self) -> Any:
        return None

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        return f"{self.__class__.__name__} @ axis {self.axis}"

    # -- construction -------------------------------------------------------------
    @classmethod
    def get_help(cls) -> str:
        conditions = sorted(set(BCBase._conditions))
        return f"Possible boundary conditions are: {conditions}"

    @classmethod
    def from_str(
        cls, grid: GridBase, axis: int, upper: bool, condition: str, *, rank: int = 0, **kwargs
    ) -> BCBase:
        """Create a boundary condition from a string identifier."""
        if condition in ("auto_periodic_neumann", "natural", "auto_periodic_dirichlet"):
            if grid.periodic[axis]:
                condition = "periodic"
            elif condition == "auto_periodic_dirichlet":
                condition = "value"
            else:
                condition = "derivative"
        if condition == "periodic" or condition == "anti-periodic":
            flip = condition == "anti-periodic"
            if not grid.periodic[axis]:
                raise PeriodicityError(
                    "Periodic boundary conditions can only be set on periodic axes"
                )
            return _PeriodicBC(grid, axis, upper, flip_sign=flip, rank=rank)
        if condition == "no-flux":
            condition, kwargs = "derivative", {"value": 0, **kwargs}
        # callable values route through ExpressionBC with the matching target
        if callable(kwargs.get("value")) or callable(kwargs.get("const")):
            targets = {
                "value": "value", "dirichlet": "value",
                "derivative": "derivative", "neumann": "derivative",
                "mixed": "mixed", "robin": "mixed",
                "virtual_point": "virtual_point",
            }
            if condition in targets:
                kwargs.setdefault("target", targets[condition])
                return ExpressionBC(grid, axis, upper, rank=rank, **kwargs)
        try:
            bc_cls = BCBase._conditions[condition]
        except KeyError:
            raise BCDataError(
                f"Boundary condition `{condition}` not defined. " + cls.get_help()
            ) from None
        return bc_cls(grid, axis, upper, rank=rank, **kwargs)

    @classmethod
    def from_dict(
        cls, grid: GridBase, axis: int, upper: bool, data: dict, *, rank: int = 0
    ) -> BCBase:
        """Create a boundary condition from a dictionary specification."""
        data = dict(data)
        if "type" in data:
            b_type = data.pop("type")
            return cls.from_str(grid, axis, upper, b_type, rank=rank, **data)
        if len(data) == 0:
            raise BCDataError("Boundary condition defined by empty dictionary")
        # find the single key that names a condition
        for key in list(data):
            if key in BCBase._conditions:
                b_type = key
                b_value = data.pop(key)
                return cls.from_str(
                    grid, axis, upper, b_type, rank=rank, value=b_value, **data
                )
        raise BCDataError(
            f"Could not interpret boundary data `{data}`. " + cls.get_help()
        )

    @classmethod
    def from_data(
        cls, grid: GridBase, axis: int, upper: bool, data, *, rank: int = 0
    ) -> BCBase:
        """Create a boundary condition from flexible data."""
        if isinstance(data, BCBase):
            bc = data.copy()
            if (bc.grid, bc.axis, bc.upper, bc.rank) != (grid, axis, upper, rank):
                bc = data.copy_for(grid, axis, upper, rank=rank)
            return bc
        if isinstance(data, str):
            return cls.from_str(grid, axis, upper, data, rank=rank)
        if isinstance(data, dict):
            return cls.from_dict(grid, axis, upper, data, rank=rank)
        if callable(data):
            return UserBC(grid, axis, upper, rank=rank)
        if isinstance(data, (numbers.Number, np.ndarray, list, tuple)):
            # plain number: Dirichlet value (legacy behavior)
            return DirichletBC(grid, axis, upper, rank=rank, value=data)
        raise BCDataError(f"Unsupported boundary format: `{data}`. " + cls.get_help())

    def copy(self) -> BCBase:
        import copy as _copy

        return _copy.copy(self)

    def copy_for(self, grid, axis=None, upper=None, *, rank=None) -> BCBase:
        """Copy this condition onto a different grid/axis/side."""
        raise NotImplementedError

    def to_subgrid(self, subgrid: GridBase) -> BCBase:
        """Return a version of this condition valid on a subgrid."""
        return self.copy_for(subgrid, self.axis, self.upper, rank=self.rank)

    # -- indexing helpers -----------------------------------------------------------
    def _ghost_indices(self, ndim: int, read_offset: int = 0):
        """Index tuples (write, read) into a full data array with `ndim` axes.

        The number of leading (tensor-component) axes derives from the data's
        ndim, not the BC's construction rank, mirroring the reference's
        rank-agnostic ghost setters (`local.py:1613` offset computation).
        `read_offset`: distance of the read layer from the boundary edge.
        """
        lead = ndim - self.grid.num_axes
        write: list[Any] = [slice(None)] * lead + [
            slice(1, -1) for _ in range(self.grid.num_axes)
        ]
        write[lead + self.axis] = -1 if self.upper else 0
        read = list(write)
        if self.upper:
            read[lead + self.axis] = -2 - read_offset
        else:
            read[lead + self.axis] = 1 + read_offset
        if self.normal and lead > 0:
            write[lead - 1] = self.axis
            read[lead - 1] = self.axis
        return tuple(write), tuple(read)

    def _broadcast_value(self, value):
        """Reshape a BC value so it broadcasts against the ghost hyperplane."""
        value = np.asarray(value)
        if value.ndim == 0:
            return value[()]
        n_bnd = len(self._shape_boundary)
        if value.shape == self._shape_tensor and n_bnd > 0:
            return value.reshape(value.shape + (1,) * n_bnd)
        return value

    # -- the core API ------------------------------------------------------------------
    def make_ghost_setter(self) -> Callable:
        """Return a pure function setting this BC's ghost layer.

        Returns ``setter(full, t=0.0, args=None) -> full``.
        """
        raise NotImplementedError

    def get_sparse_matrix_data(self, idx: tuple[int, ...]):
        """Return (const, {index: factor}) for building implicit matrices."""
        raise NotImplementedError(
            f"{self.__class__.__name__} does not support sparse matrices"
        )

    def get_virtual_point(self, arr, idx=None):
        """Evaluate the virtual point for host-side (numpy) data — debugging aid."""
        import jax.numpy as jnp

        full = jnp.pad(
            jnp.asarray(arr), [(0, 0)] * self.rank + [(1, 1)] * self.grid.num_axes
        )
        full = self.make_ghost_setter()(full)
        lead = self.rank
        sel: list[Any] = [slice(None)] * full.ndim
        sel[lead + self.axis] = -1 if self.upper else 0
        if idx is not None:
            others = [i for i in range(self.grid.num_axes) if i != self.axis]
            for pos, i in enumerate(others):
                sel[lead + i] = idx[pos] + 1
        result = np.asarray(full[tuple(sel)])
        return result.squeeze() if result.ndim else result[()]


class _PeriodicBC(BCBase):
    """Periodic (or anti-periodic) boundary condition."""

    names: list[str] = []  # constructed via the special "periodic" string

    def __init__(self, grid, axis, upper, *, flip_sign: bool = False, rank: int = 0):
        super().__init__(grid, axis, upper, rank=rank)
        self.flip_sign = flip_sign

    def _value_key(self):
        return self.flip_sign

    def copy_for(self, grid, axis=None, upper=None, *, rank=None):
        return _PeriodicBC(
            grid,
            self.axis if axis is None else axis,
            self.upper if upper is None else upper,
            flip_sign=self.flip_sign,
            rank=self.rank if rank is None else rank,
        )

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        ax = self.grid.axes[self.axis]
        lo, hi = self.grid.axes_bounds[self.axis]
        sign = "-" if self.flip_sign else ""
        return f"{field_name}({ax}={lo}) = {sign}{field_name}({ax}={hi})"

    def make_ghost_setter(self):
        num_axes = self.grid.num_axes
        axis = self.axis
        upper = self.upper
        sign = -1.0 if self.flip_sign else 1.0

        def setter(full, t=0.0, args=None):
            lead = full.ndim - num_axes
            write: list[Any] = [slice(None)] * lead + [slice(1, -1)] * num_axes
            write[lead + axis] = -1 if upper else 0
            read = list(write)
            read[lead + axis] = 1 if upper else -2  # opposite valid edge
            return full.at[tuple(write)].set(sign * full[tuple(read)])

        return setter

    def get_sparse_matrix_data(self, idx):
        index = 0 if self.upper else self.grid.shape[self.axis] - 1
        return 0.0, {index: -1.0 if self.flip_sign else 1.0}


class UserBC(BCBase):
    """Boundary condition with values supplied at call time via `args`.

    Provide ``args={"virtual_point": vp}``, ``args={"value": v}`` or
    ``args={"derivative": d}`` when evaluating the operator.
    Reference: `local.py:665`.
    """

    names = ["user"]

    def copy_for(self, grid, axis=None, upper=None, *, rank=None):
        return UserBC(
            grid,
            self.axis if axis is None else axis,
            self.upper if upper is None else upper,
            rank=self.rank if rank is None else rank,
        )

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        return f"user-controlled  @ {self.grid.axes[self.axis]}={self.axis_coord}"

    def make_ghost_setter(self):
        dx = float(self.grid.discretization[self.axis])

        def setter(full, t=0.0, args=None):
            import jax.numpy as jnp

            if args is None:
                return full  # no-op without user data
            write_t, read_t = self._ghost_indices(full.ndim)
            if "virtual_point" in args:
                ghost = jnp.asarray(args["virtual_point"])
            elif "value" in args:
                ghost = 2 * jnp.asarray(args["value"]) - full[read_t]
            elif "derivative" in args:
                ghost = dx * jnp.asarray(args["derivative"]) + full[read_t]
            else:
                return full
            return full.at[write_t].set(jnp.broadcast_to(ghost, full[read_t].shape))

        return setter


class ConstBCBase(BCBase):
    """Base class for conditions with a constant (possibly space-dependent) value."""

    value_is_linked: bool = False

    def __init__(self, grid, axis, upper, *, rank: int = 0, value=0):
        super().__init__(grid, axis, upper, rank=rank)
        self.value = value  # calls the setter

    @property
    def value(self):
        return self._value

    @value.setter
    def value(self, value):
        self._value = self._parse_value(value)
        self.homogeneous = np.isscalar(self._value) or (
            isinstance(self._value, np.ndarray)
            and self._value.shape == self._shape_tensor
        )

    def _value_key(self):
        return _hash_value(self._value)

    def _repr_value(self):
        return [f"value={self._value!r}"]

    def _parse_value(self, value):
        """Parse a BC value: scalar, array, or coordinate expression string."""
        if isinstance(value, str):
            return self._value_from_expression(value)
        if np.isscalar(value) or isinstance(value, numbers.Number):
            return float(np.real_if_close(value)) if not np.iscomplexobj(value) else complex(value)
        value = np.asarray(value)
        if value.ndim == 0:
            return float(value) if not np.iscomplexobj(value) else complex(value)
        # accept tensor-shaped, boundary-shaped, or combined values
        expected_shapes = {
            self._shape_tensor + self._shape_boundary,
            self._shape_tensor,
            self._shape_boundary,
        }
        if value.shape in expected_shapes:
            return value
        try:
            return np.broadcast_to(value, self._shape_tensor + self._shape_boundary)
        except ValueError:
            raise BCDataError(
                f"Value shape {value.shape} incompatible with tensor shape "
                f"{self._shape_tensor} and boundary shape {self._shape_boundary}"
            ) from None

    def _value_from_expression(self, expression: str):
        """Evaluate an expression of the boundary coordinates."""
        from ...utils.expressions import ScalarExpression

        expr = ScalarExpression(expression, signature=self.grid.axes, allow_indexed=True)
        bc_coords = self.grid._boundary_coordinates(self.axis, self.upper)
        coord_arrays = [bc_coords[..., i] for i in range(self.grid.num_axes)]
        values = expr(*coord_arrays)
        return np.broadcast_to(values, self._shape_boundary).astype(float)

    def copy_for(self, grid, axis=None, upper=None, *, rank=None):
        axis = self.axis if axis is None else axis
        upper = self.upper if upper is None else upper
        rank = self.rank if rank is None else rank
        new = self.__class__(grid, axis, upper, rank=rank, value=0)
        value = self._value
        if isinstance(value, np.ndarray) and value.shape[-len(self._shape_boundary):] == self._shape_boundary and self._shape_boundary:
            # spatial values cannot be transplanted blindly; re-broadcast if possible
            try:
                value = np.broadcast_to(value, new._shape_tensor + new._shape_boundary)
            except ValueError as err:
                raise BCDataError(
                    "Cannot transfer inhomogeneous boundary value to new grid"
                ) from err
        new._value = np.asarray(value) if isinstance(value, np.ndarray) else value
        new.homogeneous = self.homogeneous
        return new

    def to_subgrid(self, subgrid: GridBase) -> BCBase:
        new = self.__class__(subgrid, self.axis, self.upper, rank=self.rank, value=0)
        value = self._value
        if isinstance(value, np.ndarray) and not self.homogeneous:
            raise NotImplementedError(
                "Inhomogeneous boundary values are not supported on subgrids yet"
            )
        new._value = value
        new.homogeneous = self.homogeneous
        return new


class ConstBC1stOrderBase(ConstBCBase):
    """Conditions whose virtual point is affine in one adjacent cell."""

    def get_virtual_point_data(self) -> tuple[Any, Any, int]:
        """Return (const, factor, index) with ghost = const + factor*data[index]."""
        raise NotImplementedError

    def make_ghost_setter(self):
        const, factor, index = self.get_virtual_point_data()
        edge = self.grid.shape[self.axis] - 1 if self.upper else 0
        offset = abs(index - edge)
        const_b = self._broadcast_value(const)
        factor_b = self._broadcast_value(factor)

        def setter(full, t=0.0, args=None):
            write_t, read_t = self._ghost_indices(full.ndim, read_offset=offset)
            return full.at[write_t].set(const_b + factor_b * full[read_t])

        return setter

    def get_sparse_matrix_data(self, idx):
        const, factor, index = self.get_virtual_point_data()
        if self.homogeneous:
            c, f = const, factor
        else:
            idx_c = list(idx)
            del idx_c[self.axis]
            c = np.asarray(const)[tuple(idx_c)]
            f = np.asarray(factor)[tuple(idx_c)]
        return np.asarray(c).item() if np.ndim(c) == 0 else c, {index: f}


class DirichletBC(ConstBC1stOrderBase):
    """Imposes the value of the field at the boundary.

    Reference: `local.py:1734`.
    """

    names = ["value", "dirichlet"]

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        ax = self.grid.axes[self.axis]
        return f"{field_name} = {self.value}   @ {ax}={self.axis_coord}"

    def get_virtual_point_data(self):
        const = 2 * np.asarray(self.value)
        index = self.grid.shape[self.axis] - 1 if self.upper else 0
        return (const, -np.ones_like(const), index)


class NeumannBC(ConstBC1stOrderBase):
    """Imposes the derivative in the outward normal direction.

    Reference: `local.py:1756`.
    """

    names = ["derivative", "neumann"]

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        sign = " " if self.upper else "-"
        ax = self.grid.axes[self.axis]
        return f"{sign}∂{field_name}/∂{ax} = {self.value}   @ {ax}={self.axis_coord}"

    def get_virtual_point_data(self):
        dx = self.grid.discretization[self.axis]
        const = dx * np.asarray(self.value)
        index = self.grid.shape[self.axis] - 1 if self.upper else 0
        return (const, np.ones_like(const), index)


class MixedBC(ConstBC1stOrderBase):
    r"""Robin condition :math:`\partial_n c + \gamma c = \beta`.

    `value` is :math:`\gamma`, `const` is :math:`\beta`.
    Reference: `local.py:1781`.
    """

    names = ["mixed", "robin"]

    def __init__(self, grid, axis, upper, *, rank: int = 0, value=0, const=0):
        super().__init__(grid, axis, upper, rank=rank, value=value)
        self.const = self._parse_value(const)

    def _value_key(self):
        return (_hash_value(self._value), _hash_value(self.const))

    def copy_for(self, grid, axis=None, upper=None, *, rank=None):
        new = super().copy_for(grid, axis, upper, rank=rank)
        new.const = self.const
        return new

    def to_subgrid(self, subgrid):
        new = super().to_subgrid(subgrid)
        new.const = self.const
        return new

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        sign = "" if self.upper else "-"
        ax = self.grid.axes[self.axis]
        return (
            f"{sign}∂{field_name}/∂{ax} + {self.value} * {field_name} = {self.const}"
            f"   @ {ax}={self.axis_coord}"
        )

    def get_virtual_point_data(self):
        dx = self.grid.discretization[self.axis]
        gamma = np.asarray(self.value, dtype=float)
        beta = np.asarray(self.const, dtype=float)
        with np.errstate(invalid="ignore"):
            const = np.asarray(2 * dx * beta / (2 + dx * gamma))
            factor = np.asarray((2 - dx * gamma) / (2 + dx * gamma))
        const = np.where(np.isfinite(factor), const, 0.0)
        factor = np.where(np.isfinite(factor), factor, -1.0)
        index = self.grid.shape[self.axis] - 1 if self.upper else 0
        return (const, factor, index)


class ConstBC2ndOrderBase(ConstBCBase):
    """Conditions whose virtual point involves two adjacent cells."""

    def get_virtual_point_data(self) -> tuple[Any, Any, int, Any, int]:
        """Return (const, factor1, index1, factor2, index2)."""
        raise NotImplementedError

    def make_ghost_setter(self):
        const, f1, i1, f2, i2 = self.get_virtual_point_data()
        edge = self.grid.shape[self.axis] - 1 if self.upper else 0
        off1, off2 = abs(i1 - edge), abs(i2 - edge)
        const_b = self._broadcast_value(const)
        f1_b = self._broadcast_value(f1)
        f2_b = self._broadcast_value(f2)

        def setter(full, t=0.0, args=None):
            write_t, read1_t = self._ghost_indices(full.ndim, read_offset=off1)
            _, read2_t = self._ghost_indices(full.ndim, read_offset=off2)
            ghost = const_b + f1_b * full[read1_t] + f2_b * full[read2_t]
            return full.at[write_t].set(ghost)

        return setter

    def get_sparse_matrix_data(self, idx):
        const, f1, i1, f2, i2 = self.get_virtual_point_data()
        if self.homogeneous:
            return (
                np.asarray(const).item() if np.ndim(const) == 0 else const,
                {i1: f1, i2: f2},
            )
        idx_c = list(idx)
        del idx_c[self.axis]
        sel = tuple(idx_c)
        return np.asarray(const)[sel], {i1: np.asarray(f1)[sel], i2: np.asarray(f2)[sel]}


class CurvatureBC(ConstBC2ndOrderBase):
    """Imposes the second normal derivative at the boundary.

    Reference: `local.py:2064`.
    """

    names = ["curvature", "second_derivative", "extrapolate"]

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        sign = " " if self.upper else "-"
        ax = self.grid.axes[self.axis]
        return f"{sign}∂²{field_name}/∂{ax}² = {self.value}   @ {ax}={self.axis_coord}"

    def get_virtual_point_data(self):
        size = self.grid.shape[self.axis]
        dx = self.grid.discretization[self.axis]
        if size < 2:
            raise RuntimeError(
                "Need at least 2 support points to use curvature boundary conditions"
            )
        value = np.asarray(self.value) * dx**2
        f1 = np.full_like(np.asarray(value, dtype=float), 2.0)
        f2 = np.full_like(np.asarray(value, dtype=float), -1.0)
        if self.upper:
            i1, i2 = size - 1, size - 2
        else:
            i1, i2 = 0, 1
        return (value, f1, i1, f2, i2)


class ExpressionBC(BCBase):
    """Boundary condition calculated from an expression or function.

    The expression may depend on the adjacent cell value (`value`), the grid
    coordinates of the boundary point, and time `t`.
    Reference: `local.py:766`.
    """

    names = ["virtual_point"]

    def __init__(
        self,
        grid,
        axis,
        upper,
        *,
        rank: int = 0,
        value=0,
        const=0,
        target: str = "virtual_point",
        user_funcs=None,
        value_cell=None,
    ):
        super().__init__(grid, axis, upper, rank=rank)
        if self.rank != 0:
            raise NotImplementedError(
                "Expression boundary conditions only work for scalar fields"
            )
        self.value_cell = value_cell
        self._input = {
            "value_expr": value,
            "const_expr": const,
            "target": target,
            "user_funcs": user_funcs,
        }
        self._func = None
        if callable(value) or callable(const):
            if target == "virtual_point":
                self._func = value
            elif target == "value":
                self._func = lambda adj, dx, *rest: 2 * value(adj, dx, *rest) - adj
            elif target == "derivative":
                self._func = lambda adj, dx, *rest: dx * value(adj, dx, *rest) + adj
            elif target == "mixed":
                def _mixed(adj, dx, *rest):
                    gam = value(adj, dx, *rest)
                    bet = const(adj, dx, *rest) if callable(const) else const
                    return (2 * dx * bet + (2 - gam * dx) * adj) / (gam * dx + 2)

                self._func = _mixed
            else:
                raise ValueError(f"Unknown target `{target}` for expression")
        else:
            if target == "virtual_point":
                expression = f"{value}"
            elif target == "value":
                expression = f"2 * ({value}) - value"
            elif target == "derivative":
                expression = f"dx * ({value}) + value"
            elif target == "mixed":
                numerator = f"2 * dx * ({const}) + (2 - ({value}) * dx) * value"
                expression = f"({numerator}) / (({value}) * dx + 2)"
            else:
                raise ValueError(f"Unknown target `{target}` for expression")
            from ...utils.expressions import ScalarExpression

            signature = ["value", "dx", *grid.axes, "t"]
            self._expr = ScalarExpression(
                expression, signature=signature, user_funcs=user_funcs
            )
            self._func = self._expr._get_function(backend="jax")

    def _value_key(self):
        return (
            str(self._input["value_expr"]),
            str(self._input["const_expr"]),
            self._input["target"],
            self.value_cell,
        )

    def copy_for(self, grid, axis=None, upper=None, *, rank=None):
        return ExpressionBC(
            grid,
            self.axis if axis is None else axis,
            self.upper if upper is None else upper,
            rank=self.rank if rank is None else rank,
            value=self._input["value_expr"],
            const=self._input["const_expr"],
            target=self._input["target"],
            user_funcs=self._input["user_funcs"],
            value_cell=self.value_cell,
        )

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        target = self._input["target"]
        ax = self.grid.axes[self.axis]
        return (
            f"{target}({field_name}) = {self._input['value_expr']}"
            f"   @ {ax}={self.axis_coord}"
        )

    def make_ghost_setter(self):
        import jax.numpy as jnp

        dx = float(self.grid.discretization[self.axis])
        if self.value_cell is None:
            read_offset = 0
        else:
            edge = self.grid.shape[self.axis] - 1 if self.upper else 0
            read_offset = abs(self.value_cell - edge)
        bc_coords = self.grid._boundary_coordinates(self.axis, self.upper)
        # keep the coordinates as NumPy: the setter may be constructed inside
        # someone else's jit trace (operators build lazily on first call), and
        # jax arrays created under trace A and closed over by a cached closure
        # can leak into trace B as stale tracers (observed flakily, id-reuse
        # dependent); np constants convert freshly per trace instead
        coord_arrays = tuple(
            np.asarray(bc_coords[..., i]) for i in range(self.grid.num_axes)
        )
        func = self._func

        def setter(full, t=0.0, args=None):
            write_t, read_t = self._ghost_indices(full.ndim, read_offset=read_offset)
            adjacent = full[read_t]
            ghost = func(adjacent, dx, *coord_arrays, t)
            return full.at[write_t].set(jnp.broadcast_to(ghost, adjacent.shape))

        return setter


class ExpressionValueBC(ExpressionBC):
    """Dirichlet condition from an expression of coordinates and time."""

    names = ["value_expression", "value_expr"]

    def __init__(self, grid, axis, upper, *, rank=0, value=0, const=0, target="value", **kwargs):
        super().__init__(grid, axis, upper, rank=rank, value=value, const=const, target=target, **kwargs)


class ExpressionDerivativeBC(ExpressionBC):
    """Neumann condition from an expression of coordinates and time."""

    names = ["derivative_expression", "derivative_expr"]

    def __init__(self, grid, axis, upper, *, rank=0, value=0, const=0, target="derivative", **kwargs):
        super().__init__(grid, axis, upper, rank=rank, value=value, const=const, target=target, **kwargs)


class ExpressionMixedBC(ExpressionBC):
    """Robin condition from expressions of coordinates and time."""

    names = ["mixed_expression", "mixed_expr", "robin_expression", "robin_expr"]

    def __init__(self, grid, axis, upper, *, rank=0, value=0, const=0, target="mixed", **kwargs):
        super().__init__(grid, axis, upper, rank=rank, value=value, const=const, target=target, **kwargs)


class NormalDirichletBC(DirichletBC):
    """Dirichlet condition affecting only the normal field component."""

    names = ["normal_value", "normal_dirichlet", "dirichlet_normal"]
    normal = True


class NormalNeumannBC(NeumannBC):
    """Neumann condition affecting only the normal field component."""

    names = ["normal_derivative", "normal_neumann", "neumann_normal"]
    normal = True


class NormalMixedBC(MixedBC):
    """Robin condition affecting only the normal field component."""

    names = ["normal_mixed", "normal_robin"]
    normal = True


class NormalCurvatureBC(CurvatureBC):
    """Curvature condition affecting only the normal field component."""

    names = ["normal_curvature"]
    normal = True


def registered_boundary_condition_classes() -> dict[str, type[BCBase]]:
    """All registered boundary condition classes."""
    return dict(BCBase._subclasses)


def registered_boundary_condition_names() -> dict[str, type[BCBase]]:
    """All registered boundary condition names."""
    return dict(BCBase._conditions)
