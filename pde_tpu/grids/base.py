"""Base class for grids — static, hashable geometry metadata.

TPU-native re-design of the reference grid layer
(`/root/reference/pde/grids/base.py:124` ``GridBase``). Grids here are immutable,
hashable host-side objects: they hold shapes, coordinates, and cell volumes as
numpy data, and act as *static* arguments of jitted functions. All compiled
computation is produced by operator factories (:mod:`pde_tpu.ops`) specialized
to one grid + boundary-condition set, mirroring ``grid.make_operator``
(`grids/base.py:1198`) but returning pure JAX functions.
"""

from __future__ import annotations

import functools
import json
from typing import TYPE_CHECKING, Any, Callable

import numpy as np

from .coordinates import CoordinatesBase, DimensionError

if TYPE_CHECKING:
    from .boundaries.axes import BoundariesBase


class DomainError(ValueError):
    """Exception indicating that a point lies outside the domain."""


class PeriodicityError(RuntimeError):
    """Exception indicating inconsistent grid periodicity."""


def _check_shape(shape) -> tuple[int, ...]:
    """Normalize a shape specification to a tuple of positive ints."""
    if not hasattr(shape, "__iter__"):
        shape = [shape]
    if len(shape) == 0:
        raise ValueError("Require at least one dimension")
    result = []
    for n in shape:
        if n != int(n) or n < 1:
            raise ValueError(f"{n!r} is not a valid number of support points")
        result.append(int(n))
    return tuple(result)


def discretize_interval(x_min: float, x_max: float, num: int):
    """Equidistant cell-centered discretization of an interval.

    Returns:
        tuple: (cell midpoints, cell size dx)
    """
    dx = (x_max - x_min) / num
    return (np.arange(num) + 0.5) * dx + x_min, dx


class OperatorInfo:
    """Metadata for a registered differential operator."""

    __slots__ = ("factory", "rank_in", "rank_out", "name")

    def __init__(self, factory, rank_in: int, rank_out: int, name: str = ""):
        self.factory = factory
        self.rank_in = rank_in
        self.rank_out = rank_out
        self.name = name


class GridBase:
    """Abstract base class for all grids."""

    _subclasses: dict[str, type[GridBase]] = {}
    _operators: dict[str, OperatorInfo]  # per-class operator registry

    c: CoordinatesBase
    axes: list[str]
    boundary_names: dict[str, tuple[int, bool]] = {}
    coordinate_constraints: list[int] = []
    cell_volume_data: Any = None

    _shape: tuple[int, ...]
    _periodic: list[bool]

    def __init__(self) -> None:
        self._axes_coords: tuple[np.ndarray, ...] = ()
        self._axes_bounds: tuple[tuple[float, float], ...] = ()
        self._discretization: np.ndarray = np.empty(0)
        self._mesh = None  # set when this grid is a subgrid of a decomposition

    def __init_subclass__(cls, **kwargs) -> None:
        super().__init_subclass__(**kwargs)
        if cls.__name__ not in GridBase._subclasses:
            GridBase._subclasses[cls.__name__] = cls
        cls._operators = {}

    # -- fundamental properties ------------------------------------------------
    @property
    def dim(self) -> int:
        """Dimension of the embedding space."""
        return self.c.dim

    @property
    def num_axes(self) -> int:
        """Number of axes supported by the grid."""
        return len(self._shape)

    @property
    def shape(self) -> tuple[int, ...]:
        return self._shape

    @property
    def periodic(self) -> list[bool]:
        return self._periodic

    @property
    def discretization(self) -> np.ndarray:
        return self._discretization

    @property
    def axes_coords(self) -> tuple[np.ndarray, ...]:
        """Coordinates of the cell centers along each axis."""
        return self._axes_coords

    @property
    def axes_bounds(self) -> tuple[tuple[float, float], ...]:
        return self._axes_bounds

    @property
    def num_cells(self) -> int:
        return int(np.prod(self._shape))

    @property
    def _shape_full(self) -> tuple[int, ...]:
        """Shape including a single layer of ghost cells on every axis."""
        return tuple(n + 2 for n in self._shape)

    @property
    def _idx_valid(self) -> tuple[slice, ...]:
        """Slices extracting the valid region from a full (ghost) array."""
        return tuple(slice(1, n + 1) for n in self._shape)

    @functools.cached_property
    def coordinate_arrays(self) -> tuple[np.ndarray, ...]:
        """Broadcastable meshgrid arrays of the cell-center coordinates."""
        return tuple(np.meshgrid(*self.axes_coords, indexing="ij"))

    @functools.cached_property
    def cell_coords(self) -> np.ndarray:
        """Coordinates of all cell centers, shape ``shape + (num_axes,)``."""
        return np.moveaxis(np.array(np.meshgrid(*self.axes_coords, indexing="ij")), 0, -1)

    @functools.cached_property
    def cell_volumes(self) -> np.ndarray:
        """Volume of each grid cell, shape broadcastable to ``shape``."""
        d2 = self.discretization / 2
        c_low = self.cell_coords - d2
        c_high = self.cell_coords + d2
        return np.asarray(self._cell_volume(c_low, c_high))

    def _cell_volume(self, c_low, c_high):
        """Volume of cells spanned by grid-coordinate corners (subclassable)."""
        # grids may have fewer axes than the coordinate system has dimensions
        # (symmetric grids); default assumes num_axes == dim
        return self.c.cell_volume(c_low, c_high)

    @functools.cached_property
    def uniform_cell_volumes(self) -> bool:
        vols = np.asarray(self.cell_volumes)
        return bool(np.allclose(vols, vols.flat[0]))

    @functools.cached_property
    def volume(self) -> float:
        return float(np.broadcast_to(self.cell_volumes, self.shape).sum())

    # -- identity ---------------------------------------------------------------
    @property
    def state(self) -> dict[str, Any]:
        raise NotImplementedError

    @property
    def state_serialized(self) -> str:
        state = dict(self.state)
        state["class"] = self.__class__.__name__
        return json.dumps(state)

    @classmethod
    def from_state(cls, state: str | dict[str, Any]) -> GridBase:
        """Recreate a grid from a serialized state."""
        if isinstance(state, str):
            state = dict(json.loads(state))
        state = dict(state)
        cls_name = state.pop("class")
        if cls_name not in GridBase._subclasses:
            raise ValueError(f"Unknown grid class `{cls_name}`")
        return GridBase._subclasses[cls_name].from_state(state)

    def copy(self) -> GridBase:
        return self.__class__.from_state(dict(self.state))

    def __eq__(self, other) -> bool:
        if not isinstance(other, GridBase):
            return NotImplemented
        return (
            self.__class__ is other.__class__
            and self.shape == other.shape
            and self.axes_bounds == other.axes_bounds
            and self.periodic == other.periodic
        )

    def __hash__(self) -> int:
        return hash(
            (self.__class__.__name__, self.shape, self.axes_bounds, tuple(self.periodic))
        )

    def compatible_with(self, other: GridBase) -> bool:
        """Whether fields from `other` can be used with this grid."""
        return (
            self.__class__ is other.__class__
            and self.shape == other.shape
            and self.periodic == other.periodic
        )

    def assert_grid_compatible(self, other: GridBase) -> None:
        if not self.compatible_with(other):
            raise ValueError(f"Grids {self} and {other} are incompatible")

    def __repr__(self) -> str:
        args = ", ".join(f"{k}={v!r}" for k, v in self.state.items())
        return f"{self.__class__.__name__}({args})"

    # -- axis handling ------------------------------------------------------------
    def get_axis_index(self, key: int | str, allow_symmetric: bool = True) -> int:
        """Return the index of the axis given by name or index."""
        if isinstance(key, (int, np.integer)):
            if 0 <= key < self.num_axes:
                return int(key)
            raise IndexError(f"Axis index {key} out of bounds")
        if key in self.axes:
            return self.axes.index(key)
        # alternative axis names from the coordinate system
        for name, alts in self.c._axes_alt.items():
            if key in alts and name in self.axes:
                return self.axes.index(name)
        raise ValueError(f"`{key}` is not a valid axis name; use one of {self.axes}")

    def _get_boundary_index(self, index) -> tuple[int, bool]:
        """Parse a boundary specification into (axis, upper)."""
        if isinstance(index, str):
            if index in self.boundary_names:
                return self.boundary_names[index]
            if index.endswith(("-", "+")):
                axis = self.get_axis_index(index[:-1])
                return axis, index.endswith("+")
            raise ValueError(f"Unknown boundary `{index}`")
        axis, upper = index
        if isinstance(axis, str):
            axis = self.get_axis_index(axis)
        return int(axis), bool(upper)

    def _boundary_coordinates(self, axis: int, upper: bool, *, offset: float = 0.0):
        """Coordinates of the boundary cell centers, with the boundary position
        substituted along `axis`.

        Returns array of shape ``grid.shape[:axis] + grid.shape[axis+1:] + (num_axes,)``
        """
        coords = [np.asarray(c) for c in self.axes_coords]
        bound = self.axes_bounds[axis][1 if upper else 0]
        sign = 1 if upper else -1
        coords[axis] = np.array([bound + sign * offset])
        mesh = np.meshgrid(*coords, indexing="ij")
        arr = np.moveaxis(np.array(mesh), 0, -1)
        return np.squeeze(arr, axis=axis)

    # -- boundary conditions -------------------------------------------------------
    def get_boundary_conditions(self, bc="auto_periodic_neumann", rank: int = 0):
        """Construct boundary conditions from a flexible specification.

        Supports the reference BC mini-language
        (`/root/reference/pde/grids/boundaries/__init__.py:1-60`).
        """
        from .boundaries.axes import BoundariesBase

        if self._mesh is not None:
            # this grid is the local template of a decomposition: parse the
            # specification on the GLOBAL grid (so coordinate expressions and
            # boundary-value arrays refer to global coordinates/shapes), then
            # swap in halo-exchanging conditions (reference `_mesh.py:535`)
            from ..parallel.boundaries import ShardedBoundaries

            if isinstance(bc, ShardedBoundaries):
                return bc
            bcs = BoundariesBase.from_data(bc, grid=self._mesh.basegrid, rank=rank)
            return self._mesh.extract_boundary_conditions(bcs)
        return BoundariesBase.from_data(bc, grid=self, rank=rank)

    # -- operators -------------------------------------------------------------------
    @classmethod
    def register_operator(cls, name: str, factory=None, rank_in: int = 0, rank_out: int = 0):
        """Register a differential operator factory for this grid class.

        Mirrors `backends/base.py:257 register_operator` of the reference but keyed
        only by grid class (there is one backend: XLA).
        """

        def register(factory):
            cls._operators[name] = OperatorInfo(factory, rank_in, rank_out, name)
            return factory

        if factory is None:
            return register
        return register(factory)

    @classmethod
    def _get_operator_info(cls, operator: str) -> OperatorInfo:
        if isinstance(operator, OperatorInfo):
            return operator
        # ensure operator modules are imported
        import pde_tpu.ops  # noqa: F401

        for klass in cls.__mro__:
            ops = getattr(klass, "_operators", None)
            if ops and operator in ops:
                return ops[operator]
        available = sorted(cls.operators())
        raise NotImplementedError(
            f"Operator `{operator}` is not defined for grid {cls.__name__}. "
            f"Defined operators: {available}"
        )

    @classmethod
    def operators(cls) -> set[str]:
        """Set of all operator names defined for this grid class."""
        import pde_tpu.ops  # noqa: F401

        result: set[str] = set()
        for klass in cls.__mro__:
            result |= set(getattr(klass, "_operators", {}) or {})
        return result

    def _resolve_axis_operator(self, operator: str) -> OperatorInfo | None:
        """Resolve per-axis derivative patterns ``d_d{ax}[_method]``/``d2_d{ax}2``.

        The reference registers these on demand per axis name
        (`backends/numba/backend.py:145-175`).
        """
        from ..ops.common import make_derivative, make_derivative2

        if operator.startswith("d2_d") and operator.endswith("2"):
            name = operator[len("d2_d") : -1]
            if name in self.axes:
                factory = functools.partial(make_derivative2, axis=self.axes.index(name))
                return OperatorInfo(factory, rank_in=0, rank_out=0, name=operator)
        elif operator.startswith("d_d"):
            name = operator[len("d_d") :]
            method = "central"
            for direction in ("central", "forward", "backward"):
                if name.endswith("_" + direction):
                    method = direction
                    name = name[: -len("_" + direction)]
                    break
            if name in self.axes:
                factory = functools.partial(
                    make_derivative, axis=self.axes.index(name), method=method
                )
                return OperatorInfo(factory, rank_in=0, rank_out=0, name=operator)
        return None

    def make_operator(
        self, operator: str, bc, *, jit: bool = True, **kwargs
    ) -> Callable:
        """Return a compiled function applying `operator` with boundary conditions.

        The returned function maps *valid* field data to valid field data:
        ``op(data, t=0.0, args=None) -> out``. Compiled operators are cached per
        (operator, boundary conditions, kwargs). Reference: `grids/base.py:1198`.
        """
        import jax

        if isinstance(operator, str):
            info = self._resolve_axis_operator(operator) or self._get_operator_info(operator)
        else:
            info = self._get_operator_info(operator)
        bcs = self.get_boundary_conditions(bc, rank=info.rank_in)
        cache = self.__dict__.setdefault("_operator_cache", {})
        from ..utils.config import config as global_config

        config_key = tuple(sorted(global_config["operators"].to_dict().items()))
        try:
            key = (operator, bcs, jit, tuple(sorted(kwargs.items())), config_key)
            hash(key)
        except TypeError:
            key = None
        if key is not None and key in cache:
            return cache[key]
        op = info.factory(self, bcs=bcs, **kwargs)
        if jit:
            op = jax.jit(op)
        if key is not None:
            cache[key] = op
        return op

    def make_operator_no_bc(self, operator: str, **kwargs) -> Callable:
        """Return a function applying `operator` to *full* data (with ghost cells).

        ``op(data_full) -> data_valid``. Reference: `grids/base.py:1153`.
        """
        info = None
        if isinstance(operator, str):
            info = self._resolve_axis_operator(operator)
        info = info or self._get_operator_info(operator)
        return info.factory(self, bcs=None, **kwargs)

    # -- integration -----------------------------------------------------------------
    @functools.cached_property
    def _axis_volume_factors(self) -> list[np.ndarray]:
        """Per-axis 1D arrays whose outer product equals ``cell_volumes``."""
        # default: uniform separable factors (valid for Cartesian grids);
        # curvilinear grids override this
        return [
            np.full(self.shape[i], self.discretization[i]) for i in range(self.num_axes)
        ]

    def integrate(self, data, axes=None):
        """Integrate data over (a subset of) the grid axes."""
        import jax
        import jax.numpy as jnp

        if axes is None:
            axes_list = list(range(self.num_axes))
        elif isinstance(axes, int):
            axes_list = [axes % self.num_axes]
        else:
            axes_list = sorted(a % self.num_axes for a in axes)
        data = jnp.asarray(data)
        for ax in axes_list:
            shape = [1] * self.num_axes
            shape[ax] = self.shape[ax]
            data = data * _axis_volume_factor_traced(self, ax).reshape(shape)
        neg_axes = tuple(a - self.num_axes for a in axes_list)
        result = jnp.sum(data, axis=neg_axes)
        if self._mesh is not None and len(axes_list) == self.num_axes:
            # inside shard_map on a decomposed grid: reduce across all shards
            # (reference: MPI allreduce, `backends/numba_mpi/backend.py:196`)
            names = tuple(
                name
                for name, n in zip(self._mesh.axis_names, self._mesh.decomposition, strict=True)
                if n > 1
            )
            if names:
                result = jax.lax.psum(result, names)
        return result

    # -- point handling -----------------------------------------------------------------
    def point_to_cartesian(self, points, *, full: bool = False):
        """Convert grid coordinates to Cartesian coordinates.

        With ``full=True`` the input already carries all ``dim`` coordinates;
        otherwise symmetric grid coordinates are expanded via ``_coords_full``
        (reference `grids/base.py:690`).
        """
        points = np.atleast_1d(points)
        if not full:
            points = self._coords_full(points)
        return self.c.pos_to_cart(points)

    def point_from_cartesian(self, points, *, full: bool = False):
        """Convert Cartesian coordinates to grid coordinates."""
        coords = self.c.pos_from_cart(np.atleast_1d(points))
        return self._coords_symmetric(coords) if not full else coords

    def _coords_symmetric(self, points):
        """Reduce full coordinates to the grid's symmetric coordinates."""
        return points

    def _coords_full(self, points, value: str | float = "min"):
        """Extend symmetric coordinates to the full coordinate dimension."""
        return points

    def transform(self, coordinates, source: str, target: str, *, full: bool = False):
        """Converts coordinates between representations 'cartesian', 'grid', 'cell'."""
        coordinates = np.atleast_1d(coordinates)
        if source == target:
            return coordinates
        # normalize to grid coordinates
        if source == "cartesian":
            grid_coords = self.point_from_cartesian(coordinates, full=full)
        elif source == "cell":
            dx = self.discretization
            x0 = np.array([b[0] for b in self.axes_bounds])
            grid_coords = x0 + coordinates * dx
        elif source == "grid":
            grid_coords = coordinates
        else:
            raise ValueError(f"Unknown coordinate system `{source}`")
        if target == "grid":
            return grid_coords
        if target == "cartesian":
            return self.point_to_cartesian(grid_coords, full=full)
        if target == "cell":
            dx = self.discretization
            x0 = np.array([b[0] for b in self.axes_bounds])
            return (grid_coords - x0) / dx
        raise ValueError(f"Unknown coordinate system `{target}`")

    def contains_point(self, points, *, coords: str = "cartesian", full: bool = False):
        """Check whether points are contained within the grid."""
        points = self.transform(np.atleast_1d(points), coords, "grid", full=full)
        result = np.ones(points.shape[:-1], dtype=bool)
        for i, (lo, hi) in enumerate(self.axes_bounds):
            result &= (points[..., i] >= lo) & (points[..., i] <= hi)
        return result

    def normalize_point(self, point, *, reflect: bool = False):
        """Normalize coordinates by applying periodic boundary conditions."""
        point = np.array(np.atleast_1d(point), dtype=float)
        if point.shape[-1] != self.num_axes:
            raise DimensionError(
                f"Point with {point.shape[-1]} coordinates cannot be normalized on a "
                f"grid with {self.num_axes} axes"
            )
        for i in range(self.num_axes):
            lo, hi = self.axes_bounds[i]
            length = hi - lo
            if self.periodic[i]:
                point[..., i] = (point[..., i] - lo) % length + lo
            elif reflect:
                arg = (point[..., i] - hi) % (2 * length)
                point[..., i] = hi - np.abs(arg - length)
        return point

    def iter_mirror_points(self, point, with_self: bool = False, only_periodic: bool = True):
        """Generate mirror points of `point` across periodic boundaries."""
        point = np.asanyarray(point, dtype=float)
        if with_self:
            yield point.copy()
        for i in range(self.num_axes):
            if self.periodic[i] or not only_periodic:
                lo, hi = self.axes_bounds[i]
                length = hi - lo
                for offset in (-length, length):
                    p = point.copy()
                    p[..., i] += offset
                    yield p

    def difference_vector(self, p1, p2, *, coords: str = "grid"):
        """Difference vector between two points, respecting periodicity."""
        p1 = self.transform(np.atleast_1d(p1), coords, "grid")
        p2 = self.transform(np.atleast_1d(p2), coords, "grid")
        diff = np.atleast_1d(p2) - np.atleast_1d(p1)
        for i in range(self.num_axes):
            if self.periodic[i]:
                lo, hi = self.axes_bounds[i]
                length = hi - lo
                diff[..., i] = (diff[..., i] + length / 2) % length - length / 2
        return diff

    def distance(self, p1, p2, *, coords: str = "grid"):
        """Distance between two points, respecting periodic boundaries."""
        diff = self.difference_vector(p1, p2, coords=coords)
        return np.linalg.norm(diff, axis=-1)

    def get_random_point(self, *, boundary_distance: float = 0, coords: str = "cartesian", rng=None):
        """Return a random point within the grid."""
        rng = np.random.default_rng(rng)
        cuboid_bounds = np.array(self.axes_bounds)
        lo = cuboid_bounds[:, 0] + boundary_distance
        hi = cuboid_bounds[:, 1] - boundary_distance
        if np.any(lo > hi):
            raise RuntimeError("Random points would be too close to boundary")
        point = rng.uniform(lo, hi)
        return self.transform(point, "grid", coords)

    # -- interpolation support ----------------------------------------------------------
    def _grid_to_fractional(self, points):
        """Convert grid coordinates to fractional cell indices (host or traced)."""
        import jax.numpy as jnp

        x0 = np.array([b[0] for b in self.axes_bounds])
        dx = np.asarray(self.discretization)
        return (jnp.asarray(points) - x0) / dx - 0.5

    # -- plotting / images ------------------------------------------------------------------
    def get_image_data(self, data) -> dict[str, Any]:
        raise NotImplementedError

    def get_line_data(self, data, extract: str = "auto") -> dict[str, Any]:
        raise NotImplementedError

    def get_vector_data(self, data, **kwargs) -> dict[str, Any]:
        raise NotImplementedError

    def plot(self, *args, **kwargs):
        raise NotImplementedError(
            f"Grid class {self.__class__.__name__} does not support plotting"
        )

    @property
    def typical_discretization(self) -> float:
        return float(np.mean(self.discretization))


def registered_grids() -> list[str]:
    """Names of all registered grid classes (reference `grids/base.py:1499`)."""
    return sorted(
        name for name, cls in GridBase._subclasses.items()
        if not name.endswith("Base")
    )


def registered_operators() -> dict[str, list[str]]:
    """Dictionary of all registered operators, keyed by grid class name."""
    import pde_tpu.ops  # noqa: F401

    return {
        name: sorted(cls.operators())
        for name, cls in GridBase._subclasses.items()
        if cls._operators or any(getattr(k, "_operators", None) for k in cls.__mro__)
    }


# -- shard-aware (traced) grid data -------------------------------------------------
#
# On a mesh-attached subgrid template (``grid._mesh`` set), stencil
# coefficients, coordinates, and volume factors must be the SHARD'S values,
# not the template's: one SPMD program serves every shard, so these helpers
# select the shard's slice of the GLOBAL arrays via ``lax.axis_index`` inside
# ``shard_map``. This is what enables SPMD radial decompositions of
# curvilinear grids — the reference instead compiles one operator per MPI
# rank on its own subgrid (`/root/reference/pde/grids/_mesh.py:481`). Slicing
# the same global array the serial path bakes in keeps decomposed runs
# bit-identical to serial ones. Callers must invoke these INSIDE traced
# closures (per trace), never at factory time — factory results are cached
# per grid and a baked ``axis_index`` tracer would leak. Outside ``shard_map``
# (e.g. eager shape probing on the template) the template's own static data
# is returned.


def _shard_axis_start(grid, axis: int):
    """Traced start index of this shard along ``axis``, or None if static."""
    mesh = getattr(grid, "_mesh", None)
    if mesh is None or mesh.decomposition[axis] == 1:
        return None
    import jax

    try:
        idx = jax.lax.axis_index(mesh.axis_names[axis])
    except NameError:  # not inside shard_map
        return None
    return idx * grid.shape[axis]


def axis_coords_traced(grid, axis: int = 0):
    """Cell-center coordinates along ``axis`` as a jnp array (shard-aware)."""
    import jax
    import jax.numpy as jnp

    start = _shard_axis_start(grid, axis)
    if start is None:
        return jnp.asarray(grid.axes_coords[axis])
    global_coords = jnp.asarray(grid._mesh.basegrid.axes_coords[axis])
    return jax.lax.dynamic_slice(global_coords, (start,), (grid.shape[axis],))


def _axis_volume_factor_traced(grid, axis: int):
    """Per-axis volume factor (see ``_axis_volume_factors``), shard-aware."""
    import jax
    import jax.numpy as jnp

    start = _shard_axis_start(grid, axis)
    if start is None:
        return jnp.asarray(grid._axis_volume_factors[axis])
    gfac = grid._mesh.basegrid._axis_volume_factors[axis]
    if np.ptp(gfac) == 0:  # uniform factor: no per-shard variation
        return jnp.asarray(grid._axis_volume_factors[axis])
    return jax.lax.dynamic_slice(
        jnp.asarray(gfac), (start,), (grid.shape[axis],)
    )


def cell_coords_traced(grid):
    """Per-axis cell-center coordinate arrays broadcast to ``grid.shape``.

    Shard-aware equivalent of unstacking ``grid.cell_coords`` along its last
    axis (same values on ordinary grids).
    """
    import jax.numpy as jnp

    out = []
    for ax in range(grid.num_axes):
        shape = [1] * grid.num_axes
        shape[ax] = grid.shape[ax]
        c = axis_coords_traced(grid, ax).reshape(shape)
        out.append(jnp.broadcast_to(c, grid.shape))
    return tuple(out)


def cell_volumes_traced(grid):
    """Cell volumes broadcast to ``grid.shape`` (shard-aware).

    Computed as the outer product of the per-axis volume factors, which
    equals ``grid.cell_volumes`` for every separable grid class.
    """
    import jax.numpy as jnp

    vol = None
    for ax in range(grid.num_axes):
        shape = [1] * grid.num_axes
        shape[ax] = grid.shape[ax]
        f = _axis_volume_factor_traced(grid, ax).reshape(shape)
        vol = f if vol is None else vol * f
    return jnp.broadcast_to(vol, grid.shape)


def local_slice_traced(grid, data, rank: int = 0):
    """Slice a GLOBAL data array down to this shard's local block.

    Identity on ordinary grids or when ``data`` does not span the global
    grid shape; outside ``shard_map`` the template's (shard-0) block is
    returned. ``rank`` leading component axes are kept whole.
    """
    import jax
    import jax.numpy as jnp

    arr = jnp.asarray(data)
    mesh = getattr(grid, "_mesh", None)
    if mesh is None or tuple(arr.shape[rank:]) != tuple(mesh.basegrid.shape):
        return arr
    # dynamic_slice requires uniformly typed indices: static zeros must match
    # the int32 of lax.axis_index (mixing a Python int with a traced index
    # raises under x64)
    zero = jnp.asarray(0, jnp.int32)
    starts = [zero] * rank
    for ax, n_local in enumerate(grid.shape):
        start = _shard_axis_start(grid, ax)
        starts.append(zero if start is None else jnp.asarray(start, jnp.int32))
    sizes = tuple(arr.shape[:rank]) + tuple(grid.shape)
    return jax.lax.dynamic_slice(arr, starts, sizes)


def radial_factor_traced(grid, compute, axis: int = 0):
    """Host-precomputed coordinate-dependent factor array, shard-aware.

    ``compute(coords: np.ndarray) -> np.ndarray`` is evaluated in NUMPY on
    the host — on the template's own coordinates for ordinary grids, and on
    the GLOBAL coordinates (then sliced per shard via ``lax.dynamic_slice``)
    for decomposed axes. Precomputing on the host instead of tracing the
    factor arithmetic is what keeps decomposed runs bit-identical to serial
    ones: XLA's compile-time constant folding of the same expressions can
    differ from its runtime evaluation at the ulp level (measured ~1e-13
    relative on the CPU backend), so both paths must consume identical
    precomputed values and keep only exact ops (slice, multiply) in-trace.
    """
    import jax
    import jax.numpy as jnp

    start = _shard_axis_start(grid, axis)
    if start is None:
        return jnp.asarray(compute(np.asarray(grid.axes_coords[axis])))
    gfac = jnp.asarray(
        compute(np.asarray(grid._mesh.basegrid.axes_coords[axis]))
    )
    return jax.lax.dynamic_slice(gfac, (start,), (grid.shape[axis],))
