"""Rank-generic field defined on a grid.

TPU-native re-design of `/root/reference/pde/fields/datafield_base.py:47`
(``DataFieldBase``): random initializers, interpolation, operator application,
integrals/averages, smoothing, and plotting for fields of any tensorial rank.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grids.base import DomainError, GridBase
from .base import FieldBase, RankError


class DataFieldBase(FieldBase):
    """Abstract base class for fields of a single tensorial rank."""

    rank: int  # set by subclasses

    def __init__(
        self,
        grid: GridBase,
        data: Any = "zeros",
        *,
        label: str | None = None,
        dtype=None,
        with_ghost_cells: bool = False,
    ):
        shape = (grid.dim,) * self.rank + tuple(grid.shape)
        if dtype is None:
            if isinstance(data, str):
                dtype = jnp.asarray(0.0).dtype  # default float (respects x64 flag)
            else:
                # infer from the data, promoting integers to the default float
                probe = jnp.asarray(
                    data.data if isinstance(data, DataFieldBase) else data
                )
                if jnp.issubdtype(probe.dtype, jnp.complexfloating):
                    dtype = probe.dtype
                elif jnp.issubdtype(probe.dtype, jnp.floating):
                    dtype = probe.dtype
                else:
                    dtype = jnp.asarray(0.0).dtype
        if isinstance(data, str):
            if data == "zeros" or data == "empty":
                arr = jnp.zeros(shape, dtype=dtype)
            elif data == "ones":
                arr = jnp.ones(shape, dtype=dtype)
            elif data == "random":
                arr = jnp.asarray(np.random.default_rng().uniform(size=shape), dtype=dtype)
            else:
                raise ValueError(f"Unknown data specification `{data}`")
        elif isinstance(data, DataFieldBase):
            grid.assert_grid_compatible(data.grid)
            arr = jnp.broadcast_to(jnp.asarray(data.data, dtype=dtype), shape)
        else:
            arr = jnp.asarray(data, dtype=dtype)
            if with_ghost_cells:
                valid = (slice(None),) * self.rank + grid._idx_valid
                arr = arr[valid]
            if arr.shape != shape:
                arr = jnp.broadcast_to(arr, shape)
        super().__init__(grid, arr, label=label)

    # -- constructors ------------------------------------------------------------------
    @classmethod
    def get_class_by_rank(cls, rank: int) -> type[DataFieldBase]:
        from .scalar import ScalarField
        from .tensorial import Tensor2Field
        from .vectorial import VectorField

        try:
            return {0: ScalarField, 1: VectorField, 2: Tensor2Field}[rank]
        except KeyError:
            raise RankError(f"Unsupported field rank {rank}") from None

    @classmethod
    def random_uniform(
        cls, grid: GridBase, vmin: float = 0, vmax: float = 1, *,
        label: str | None = None, dtype=None, rng=None,
    ):
        """Field with uniformly random values in [vmin, vmax)."""
        rng = np.random.default_rng(rng)
        shape = (grid.dim,) * cls.rank + tuple(grid.shape)
        if dtype is not None and np.dtype(dtype).kind == "c":
            data = rng.uniform(np.real(vmin), np.real(vmax), size=shape) + 1j * rng.uniform(
                np.imag(vmin), np.imag(vmax), size=shape
            )
        else:
            data = rng.uniform(vmin, vmax, size=shape)
        return cls(grid, data=jnp.asarray(data, dtype=dtype), label=label)

    @classmethod
    def random_normal(
        cls, grid: GridBase, mean: float = 0, std: float = 1, *,
        correlation: str = "none", label: str | None = None, dtype=None,
        rng=None, scaling: str = "none", **kwargs,
    ):
        """Field with normally distributed random values, optionally correlated.

        `scaling='physical'` scales the variance with cell volumes so the result
        converges in the continuum limit.
        """
        from ..utils.spectral import make_correlated_noise

        rng = np.random.default_rng(rng)
        shape = (grid.dim,) * cls.rank + tuple(grid.shape)
        make_noise = make_correlated_noise(
            tuple(grid.shape),
            correlation,
            discretization=grid.discretization,
            dtype=np.dtype(dtype) if dtype is not None else float,
            rng=rng,
            **kwargs,
        )
        count = int(np.prod(shape[: cls.rank])) if cls.rank else 1
        noise = np.stack([make_noise() for _ in range(count)]).reshape(shape)
        if scaling == "physical":
            noise = noise / np.sqrt(np.broadcast_to(grid.cell_volumes, grid.shape))
        elif scaling != "none":
            raise ValueError(f"Unknown noise scaling `{scaling}`")
        return cls(grid, data=jnp.asarray(mean + std * noise, dtype=dtype), label=label)

    @classmethod
    def random_harmonic(
        cls, grid: GridBase, modes: int = 3, harmonic=np.cos,
        axis_combination=np.multiply, *, label: str | None = None,
        dtype=None, rng=None,
    ):
        """Field built from a superposition of random harmonic modes."""
        rng = np.random.default_rng(rng)
        shape = (grid.dim,) * cls.rank + tuple(grid.shape)

        def _single():
            axis_data = []
            for i in range(grid.num_axes):
                lo, hi = grid.axes_bounds[i]
                x = 2 * np.pi * (grid.axes_coords[i] - lo) / (hi - lo)
                amps = rng.uniform(size=modes)
                comp = sum(a / (k + 1) * harmonic((k + 1) * x) for k, a in enumerate(amps))
                axis_data.append(comp)
            mesh = np.meshgrid(*axis_data, indexing="ij")
            return axis_combination.reduce(np.array(mesh), axis=0)

        count = int(np.prod(shape[: cls.rank])) if cls.rank else 1
        data = np.stack([_single() for _ in range(count)]).reshape(shape)
        return cls(grid, data=jnp.asarray(data, dtype=dtype), label=label)

    @classmethod
    def random_colored(
        cls, grid: GridBase, exponent: float = 0, scale: float = 1, *,
        label: str | None = None, dtype=None, rng=None,
    ):
        """Field of random values with power-law correlations ~ |k|^exponent."""
        field = cls.random_normal(
            grid, mean=0, std=scale, correlation="power law", exponent=exponent,
            label=label, dtype=dtype, rng=rng,
        )
        return field

    @classmethod
    def from_state(cls, attributes: dict[str, Any], data=None) -> DataFieldBase:
        attributes = dict(attributes)
        attributes.pop("class", None)
        grid = attributes.pop("grid")
        if isinstance(grid, str):
            grid = GridBase.from_state(grid)
        return cls(grid, data=data, **attributes)

    # -- data views ---------------------------------------------------------------------
    @property
    def data_shape(self) -> tuple[int, ...]:
        return (self.grid.dim,) * self.rank + tuple(self.grid.shape)

    def to_numpy(self) -> np.ndarray:
        """Fetch the field data to the host as a numpy array."""
        return np.asarray(self._data)

    def get_full_data(self, bc=None, *, t: float = 0.0, args=None):
        """Return data including ghost cells set according to `bc`."""
        pads = [(0, 0)] * self.rank + [(1, 1)] * self.grid.num_axes
        full = jnp.pad(self._data, pads)
        if bc is not None:
            bcs = self.grid.get_boundary_conditions(bc, rank=self.rank)
            full = bcs.make_ghost_setter()(full, t, args)
        return full

    def set_ghost_cells(self, bc, *, args=None):
        """Compatibility alias returning full data with ghost cells (functional)."""
        return self.get_full_data(bc, args=args)

    # -- operators ------------------------------------------------------------------------
    def apply_operator(
        self, operator: str, bc, out=None, *, label: str | None = None,
        args=None, t: float = 0.0, **op_kwargs,
    ) -> DataFieldBase:
        """Apply a differential operator, returning a new field.

        Reference: `fields/datafield_base.py:900`.
        """
        info = None
        if isinstance(operator, str):
            info = self.grid._resolve_axis_operator(operator)
        info = info or self.grid._get_operator_info(operator)
        if info.rank_in != self.rank:
            raise RankError(
                f"Operator `{operator}` expects rank {info.rank_in}, "
                f"got rank {self.rank}"
            )
        op = self.grid.make_operator(operator, bc=bc, **op_kwargs)
        data = op(self._data, t, args)
        result_cls = self.get_class_by_rank(info.rank_out)
        result = result_cls(self.grid, data=data, label=label)
        if out is not None:
            out._data = result._data
            return out
        return result

    # -- reductions ---------------------------------------------------------------------------
    @property
    def average(self):
        """Mean value weighted by cell volumes."""
        return self.integral / self.grid.volume

    @property
    def integral(self):
        """Volume integral of the field."""
        return self.grid.integrate(self._data)

    @property
    def fluctuations(self):
        """Quantification of the average fluctuations (volume-weighted std)."""
        avg = self.average
        lead = (Ellipsis,) + (None,) * self.grid.num_axes
        avg_b = jnp.asarray(avg)[lead] if self.rank else avg
        scaled_var = self.grid.integrate((self._data - avg_b) ** 2) / self.grid.volume
        return jnp.sqrt(scaled_var)

    @property
    def magnitude(self) -> float:
        """Absolute value of the (scalarized) average."""
        if self.rank == 0:
            return float(abs(self.average))
        return float(abs(self.to_scalar().average))

    def to_scalar(self, scalar: str = "auto", *, label: str | None = None):
        raise NotImplementedError

    # -- interpolation -----------------------------------------------------------------------
    def make_interpolator(self, *, fill=None, full_data: bool = False, bc=None) -> Callable:
        """Return a jittable linear interpolator ``interp(data, points) -> values``.

        `points` are grid coordinates of shape ``(..., num_axes)``.
        """
        grid = self.grid
        num_axes = grid.num_axes
        rank = self.rank
        use_ghost = bc is not None or full_data
        if bc is not None:
            bcs = grid.get_boundary_conditions(bc, rank=rank)
            ghost_setter = bcs.make_ghost_setter()
        else:
            ghost_setter = None
        periodic = list(grid.periodic)
        shape = grid.shape

        def interp(data, points):
            points = jnp.asarray(points)
            frac = grid._grid_to_fractional(points)
            if use_ghost:
                pads = [(0, 0)] * rank + [(1, 1)] * num_axes
                full = jnp.pad(jnp.asarray(data), pads)
                if ghost_setter is not None:
                    full = ghost_setter(full)
                offset = 1
            else:
                full = jnp.asarray(data)
                offset = 0

            idx0, weights = [], []
            for ax in range(num_axes):
                f = frac[..., ax]
                if periodic[ax]:
                    f = jnp.mod(f, shape[ax])
                i0 = jnp.floor(f).astype(jnp.int32)
                w = f - i0
                idx0.append(i0)
                weights.append(w)

            result = None
            for corner in itertools.product((0, 1), repeat=num_axes):
                idx, weight = [], None
                for ax, c in enumerate(corner):
                    i = idx0[ax] + c
                    if periodic[ax]:
                        i = jnp.mod(i, shape[ax]) + offset
                    else:
                        i = jnp.clip(i + offset, 0, shape[ax] - 1 + 2 * offset)
                    idx.append(i)
                    w = weights[ax] if c else 1 - weights[ax]
                    weight = w if weight is None else weight * w
                value = full[(Ellipsis, *idx)] * weight
                result = value if result is None else result + value
            if fill is not None:
                inside = jnp.ones(frac.shape[:-1], dtype=bool)
                for ax in range(num_axes):
                    if not periodic[ax]:
                        lim = 0.0 if use_ghost else 0.5
                        inside &= (frac[..., ax] >= -0.5 - lim) & (
                            frac[..., ax] <= shape[ax] - 0.5 + lim
                        )
                result = jnp.where(inside, result, fill)
            return result

        return interp

    def interpolate(self, point, *, bc=None, fill=None, **kwargs):
        """Interpolate the field at one or several points.

        Reference: `fields/datafield_base.py` interpolation methods.
        """
        point = np.atleast_1d(np.asarray(point, dtype=float))
        if point.shape[-1] != self.grid.num_axes:
            raise DomainError(
                f"Points must have {self.grid.num_axes} coordinates, "
                f"got shape {point.shape}"
            )
        if fill is None:
            # check on host that points lie inside the domain
            for ax in range(self.grid.num_axes):
                if not self.grid.periodic[ax]:
                    lo, hi = self.grid.axes_bounds[ax]
                    coords = point[..., ax]
                    if np.any(coords < lo) or np.any(coords > hi):
                        raise DomainError(f"Point lies outside the grid domain: {point}")
        interp = self.make_interpolator(fill=fill, bc=bc)
        return interp(self._data, jnp.asarray(point))

    def interpolate_to_grid(self, grid: GridBase, *, fill=None, label=None):
        """Interpolate the field onto a new grid.

        Grids of the same class map their coordinates directly; different
        grid classes (e.g. polar → Cartesian via
        :meth:`~pde_tpu.grids.spherical.SphericalSymGridBase.get_cartesian_grid`)
        are routed through Cartesian coordinates, which requires a scalar
        field (vector components would need a basis change). Reference:
        cross-class interpolation in `fields/datafield_base.py`.
        """
        if type(grid) is type(self.grid) and grid.num_axes == self.grid.num_axes:
            points = grid.cell_coords
        else:
            if self.rank != 0:
                raise NotImplementedError(
                    "Interpolation between different grid classes requires a "
                    "scalar field"
                )
            if grid.dim != self.grid.dim:
                raise DomainError("Grids must embed in the same dimension")
            cart = grid.point_to_cartesian(
                np.asarray(grid.cell_coords).reshape(-1, grid.num_axes)
            )
            src_pts = self.grid.point_from_cartesian(cart)
            interp = self.make_interpolator(fill=fill)
            data = interp(self._data, jnp.asarray(src_pts))
            return self.__class__(
                grid, data=jnp.reshape(data, grid.shape),
                label=label or self.label,
            )
        interp = self.make_interpolator(fill=fill)
        data = interp(self._data, jnp.asarray(points))
        return self.__class__(grid, data=data, label=label or self.label)

    def insert(self, point, amount) -> DataFieldBase:
        """Deposit `amount` at `point` using linear weights (mutates this field,
        matching the reference's in-place `insert`; returns self)."""
        grid = self.grid
        point = np.atleast_1d(np.asarray(point, dtype=float))
        frac = np.asarray(grid._grid_to_fractional(point))
        data = self._data
        cell_volumes = np.broadcast_to(grid.cell_volumes, grid.shape)
        idx0 = np.floor(frac).astype(int)
        w = frac - idx0
        for corner in itertools.product((0, 1), repeat=grid.num_axes):
            idx, weight = [], 1.0
            for ax, c in enumerate(corner):
                i = idx0[..., ax] + c
                if grid.periodic[ax]:
                    i = np.mod(i, grid.shape[ax])
                else:
                    i = np.clip(i, 0, grid.shape[ax] - 1)
                idx.append(i)
                weight = weight * (w[..., ax] if c else 1 - w[..., ax])
            vol = cell_volumes[tuple(idx)]
            data = data.at[(Ellipsis, *idx)].add(amount * weight / vol)
        self._data = data
        return self

    def get_boundary_values(self, axis: int, upper: bool, bc=None):
        """Field values on the specified boundary (midpoint of cell and ghost).

        Unlike the reference (which reuses previously set ghost cells when
        ``bc is None``, `datafield_base.py:810`), fields here carry no ghost
        state, so ``None`` extrapolates with the auto periodic/Neumann default.
        """
        full = self.get_full_data(bc if bc is not None else "auto_periodic_neumann")
        n = self.grid.num_axes
        sel_edge: list[Any] = [slice(1, -1)] * n
        sel_ghost: list[Any] = [slice(1, -1)] * n
        sel_edge[axis] = -2 if upper else 1
        sel_ghost[axis] = -1 if upper else 0
        lead = (slice(None),) * self.rank
        return 0.5 * (full[lead + tuple(sel_edge)] + full[lead + tuple(sel_ghost)])

    # -- signal processing ----------------------------------------------------------------------
    def smooth(self, sigma: float = 1, *, out=None, label: str | None = None):
        """Smooth the field with a Gaussian kernel of physical width `sigma`."""
        from scipy import ndimage

        data = np.asarray(self._data)
        for ax in range(self.grid.num_axes):
            s = sigma / self.grid.discretization[ax]
            mode = "wrap" if self.grid.periodic[ax] else "nearest"
            data = ndimage.gaussian_filter1d(
                data, sigma=s, axis=self.rank + ax, mode=mode
            )
        result = self.__class__(
            self.grid, data=jnp.asarray(data, dtype=self.dtype), label=label or self.label
        )
        if out is not None:
            out._data = result._data
            return out
        return result

    def add_interpolated(self, point, amount):
        """Deprecated alias of :meth:`insert`."""
        return self.insert(point, amount)

    # -- plotting -----------------------------------------------------------------------------
    def get_line_data(self, scalar: str = "auto", extract: str = "auto") -> dict[str, Any]:
        field = self if self.rank == 0 else self.to_scalar(scalar)
        data = field.grid.get_line_data(np.asarray(field.data), extract=extract)
        if self.label:
            data["label_y"] = self.label
        return data

    def get_image_data(self, scalar: str = "auto", **kwargs) -> dict[str, Any]:
        field = self if self.rank == 0 else self.to_scalar(scalar)
        data = field.grid.get_image_data(np.asarray(field.data), **kwargs)
        data["title"] = self.label
        return data

    def get_vector_data(self, **kwargs) -> dict[str, Any]:
        raise NotImplementedError

    def _plot_line(self, ax, scalar: str = "auto", extract: str = "auto", **kwargs):
        line_data = self.get_line_data(scalar=scalar, extract=extract)
        (line,) = ax.plot(line_data["data_x"], np.real(line_data["data_y"]), **kwargs)
        ax.set_xlabel(line_data.get("label_x", "x"))
        ax.set_ylabel(line_data.get("label_y", self.label or ""))
        return line

    def _plot_image(self, ax, colorbar: bool = True, scalar: str = "auto", **kwargs):
        img_data = self.get_image_data(scalar=scalar)
        kwargs.setdefault("origin", "lower")
        kwargs.setdefault("extent", img_data["extent"])
        kwargs.setdefault("interpolation", "none")
        im = ax.imshow(np.real(img_data["data"]), **kwargs)
        ax.set_xlabel(img_data.get("label_x", "x"))
        ax.set_ylabel(img_data.get("label_y", "y"))
        if img_data.get("title"):
            ax.set_title(img_data["title"])
        if colorbar:
            import matplotlib.pyplot as plt

            plt.colorbar(im, ax=ax)
        return im

    def plot(self, kind: str = "auto", *args, title=None, filename=None, ax=None, **kwargs):
        """Plot the field (line plot in 1d, image in 2d).

        Returns a :class:`~pde_tpu.utils.plotting.PlotReference` whose artist
        can be updated in place via :meth:`_update_plot` — the mechanism
        behind cheap live PlotTracker updates (reference
        `tools/plotting.py:175`).
        """
        import matplotlib.pyplot as plt

        from ..utils.plotting import PlotReference

        if ax is None:
            _, ax = plt.subplots()
        if kind == "auto":
            kind = "line" if self.grid.num_axes == 1 else "image"
        if kind == "line":
            element = self._plot_line(ax, *args, **kwargs)
        elif kind == "image":
            element = self._plot_image(ax, *args, **kwargs)
        elif kind == "vector":
            element = self._plot_vector(ax, *args, **kwargs)
        else:
            raise ValueError(f"Unknown plot kind `{kind}`")
        if title:
            ax.set_title(title)
        if filename:
            ax.figure.savefig(filename)
        return PlotReference(ax, element, dict(kwargs, kind=kind))

    def _update_plot(self, reference) -> None:
        """Update a plot produced by :meth:`plot` with this field's data."""
        kind = reference.parameters.get("kind", "auto")
        element = reference.element
        if kind == "line":
            line_data = self.get_line_data(
                scalar=reference.parameters.get("scalar", "auto"),
                extract=reference.parameters.get("extract", "auto"),
            )
            element.set_data(line_data["data_x"], np.real(line_data["data_y"]))
            reference.ax.relim()
            reference.ax.autoscale_view()
        elif kind == "image":
            img_data = self.get_image_data(
                scalar=reference.parameters.get("scalar", "auto")
            )
            data = np.real(img_data["data"])
            element.set_data(data)
            element.set_clim(float(data.min()), float(data.max()))
        elif kind == "vector":
            if reference.parameters.get("method", "quiver") != "quiver":
                raise NotImplementedError("Only quiver plots can be updated")
            data = self.get_vector_data()
            element.set_UVC(data["data_x"], data["data_y"])
        else:
            raise NotImplementedError(f"Cannot update plot kind `{kind}`")

    def _plot_vector(self, ax, **kwargs):
        raise NotImplementedError

    def _get_napari_data(self, **kwargs):
        return {self.label or "field": {"type": "image", "data": self.to_numpy()}}
