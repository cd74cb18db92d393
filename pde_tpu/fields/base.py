"""Base class for fields — JAX pytrees pairing device data with a static grid.

TPU-native re-design of the reference field layer
(`/root/reference/pde/fields/base.py:44` ``FieldBase``). Fields wrap a
``jax.Array`` of *valid* data (no ghost cells are stored — ghost layers are
materialized functionally inside operators) plus a static, hashable grid, so
fields can flow through ``jit``/``scan``/``shard_map`` directly.
"""

from __future__ import annotations

import json
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grids.base import GridBase


class RankError(TypeError):
    """Error indicating that a field has the wrong rank."""


def _unserialize_scalar(value):
    """Decode one serialized attribute value.

    The reference json-encodes every attribute value
    (`/root/reference/pde/fields/base.py:419-429`), so ``class`` arrives as
    ``'"ScalarField"'``; plain strings written by pre-round-5 versions of
    this package pass through unchanged (back-compat).
    """
    if isinstance(value, str):
        try:
            return json.loads(value)
        except (ValueError, TypeError):
            return value
    return value


def field_from_serialized_attributes(attributes: dict, data=None) -> "FieldBase":
    """Reconstruct a field (incl. collections) from serialized attributes.

    `attributes` maps strings to the *serialized* values written by
    :attr:`FieldBase.attributes_serialized`.
    """
    import jax.numpy as jnp

    field_cls = FieldBase._subclasses[_unserialize_scalar(attributes["class"])]
    kwargs = field_cls.unserialize_attributes(dict(attributes))
    kwargs.pop("class", None)

    from .collection import FieldCollection

    if field_cls is FieldCollection or issubclass(field_cls, FieldCollection):
        sub_attrs = kwargs.pop("fields")
        fields = []
        for fa in sub_attrs:
            fa = dict(fa)
            sub_cls = FieldBase._subclasses[_unserialize_scalar(fa.pop("class"))]
            fa.pop("dtype", None)
            grid = fa.pop("grid")
            fields.append(sub_cls(grid, **fa))  # type: ignore[call-arg]
        collection = field_cls(fields, **kwargs)
        if data is not None:
            collection.data = jnp.asarray(np.asarray(data))
        return collection

    dtype = kwargs.pop("dtype", None)
    grid = kwargs.pop("grid")
    if data is None:
        return field_cls(grid, dtype=dtype, **kwargs)  # type: ignore[call-arg]
    return field_cls(
        grid, data=jnp.asarray(np.asarray(data), dtype=dtype), **kwargs
    )  # type: ignore[call-arg]


class FieldBase:
    """Abstract base class for describing (discretized) fields."""

    _subclasses: dict[str, type[FieldBase]] = {}
    readonly = False

    def __init__(self, grid: GridBase, data, *, label: str | None = None):
        self._grid = grid
        self._data = data
        self._label = label

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        FieldBase._subclasses[cls.__name__] = cls
        # register every concrete field class as a pytree node
        jax.tree_util.register_pytree_node(
            cls, cls._tree_flatten, cls._tree_unflatten
        )

    # -- pytree protocol ------------------------------------------------------------
    def _tree_flatten(self):
        return (self._data,), (self._grid, self._label)

    @classmethod
    def _tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._grid, obj._label = aux
        obj._data = children[0]
        return obj

    # -- basic accessors ---------------------------------------------------------------
    @property
    def grid(self) -> GridBase:
        return self._grid

    @property
    def data(self):
        """:class:`jax.Array`: discretized field values at the cell centers."""
        return self._data

    @data.setter
    def data(self, value):
        """Replace the field data (functional update — shapes must broadcast)."""
        if isinstance(value, FieldBase):
            value = value.data
        self._data = jnp.broadcast_to(
            jnp.asarray(value, dtype=self._data.dtype), self._data.shape
        )

    @property
    def label(self) -> str | None:
        return self._label

    @label.setter
    def label(self, value: str | None):
        if value is None or isinstance(value, str):
            self._label = value
        else:
            raise TypeError("Label must be a string or None")

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def is_complex(self) -> bool:
        return jnp.issubdtype(self.dtype, jnp.complexfloating)

    @property
    def writeable(self) -> bool:
        return not self.readonly

    def __repr__(self) -> str:
        class_name = self.__class__.__name__
        result = f"{class_name}(grid={self.grid!r}, data=Array{list(np.shape(self._data))}"
        if self.label:
            result += f', label="{self.label}"'
        return result + ")"

    # -- copies and comparison ------------------------------------------------------------
    def copy(self, *, label: str | None = None, dtype=None) -> FieldBase:
        """Return a copy of the field (data buffers are immutable in JAX)."""
        data = self._data
        if dtype is not None:
            data = jnp.asarray(data, dtype=dtype)
        return self.__class__(self.grid, data=data, label=label or self.label)

    def assert_field_compatible(self, other: FieldBase, accept_scalar: bool = False):
        from .scalar import ScalarField

        if not isinstance(other, FieldBase):
            raise TypeError(f"Cannot combine field with {type(other)}")
        is_scalar = accept_scalar and (
            isinstance(self, ScalarField) or isinstance(other, ScalarField)
        )
        if self.__class__ is not other.__class__ and not is_scalar:
            raise TypeError(
                f"Fields {self.__class__.__name__} and {other.__class__.__name__} "
                "are incompatible"
            )
        self.grid.assert_grid_compatible(other.grid)

    def __eq__(self, other) -> bool:
        if not isinstance(other, FieldBase):
            return NotImplemented
        return (
            self.__class__ is other.__class__
            and self.grid == other.grid
            and np.array_equal(np.asarray(self._data), np.asarray(other._data))
        )

    def __hash__(self):
        return id(self)

    # -- serialization ---------------------------------------------------------------------
    @property
    def attributes(self) -> dict[str, Any]:
        return {
            "class": self.__class__.__name__,
            "grid": self.grid,
            "label": self.label,
            "dtype": str(np.dtype(self.dtype.name)),
        }

    @property
    def attributes_serialized(self) -> dict[str, str]:
        # every value json-encoded except the grid state string — the
        # reference's on-disk convention (`fields/base.py:419-429`), so
        # movie/HDF5 metadata interchange byte-for-byte
        return {
            "class": json.dumps(self.__class__.__name__),
            "grid": self.grid.state_serialized,
            "label": json.dumps(self.label),
            "dtype": json.dumps(np.dtype(self.dtype.name).str),
        }

    @classmethod
    def unserialize_attributes(cls, attributes: dict[str, str]) -> dict[str, Any]:
        if cls is FieldBase:
            field_cls = cls._subclasses[_unserialize_scalar(attributes["class"])]
            return field_cls.unserialize_attributes(attributes)
        result: dict[str, Any] = {}
        for key, value in attributes.items():
            if key == "grid":
                result[key] = GridBase.from_state(value)
            elif key == "label":
                result[key] = json.loads(value)
            elif key == "dtype":
                result[key] = np.dtype(_unserialize_scalar(value))
            elif key == "class":
                result[key] = _unserialize_scalar(value)
            else:
                result[key] = value
        return result

    @classmethod
    def from_state(cls, attributes: dict[str, Any] | str, data=None) -> FieldBase:
        """Recreate a field from (serialized) attributes and data."""
        if isinstance(attributes, str):
            attributes = dict(json.loads(attributes))
        attributes = dict(attributes)
        if isinstance(attributes.get("grid"), str) or isinstance(
            attributes.get("fields"), str
        ):
            # attributes are in serialized form
            return field_from_serialized_attributes(attributes, data)
        class_name = attributes.pop("class")
        field_cls = cls._subclasses[class_name]
        return field_cls.from_state_data(attributes, data)

    @classmethod
    def from_state_data(cls, attributes: dict[str, Any], data=None) -> FieldBase:
        attributes = dict(attributes)
        grid = attributes.pop("grid")
        attributes.pop("dtype", None)
        return cls(grid, data=data, **attributes)  # type: ignore[call-arg]

    # -- file I/O ----------------------------------------------------------------------------
    def to_file(self, filename: str, **kwargs) -> None:
        """Store the field to an HDF5 file."""
        import h5py

        with h5py.File(filename, "w") as fp:
            self._write_hdf_dataset(fp, **kwargs)

    def _write_hdf_dataset(self, hdf_path, key: str = "data", **kwargs) -> None:
        dataset = hdf_path.create_dataset(key, data=np.asarray(self.data))
        for k, v in self.attributes_serialized.items():
            dataset.attrs[k] = v

    @classmethod
    def _from_hdf_dataset(cls, dataset) -> FieldBase:
        """Rebuild a single field from an HDF5 dataset written by `_write_hdf_dataset`."""
        attributes = {k: dataset.attrs[k] for k in dataset.attrs}
        data = np.array(dataset)
        field_cls = cls._subclasses[_unserialize_scalar(attributes["class"])]
        attrs = field_cls.unserialize_attributes(attributes)
        attrs.pop("class", None)
        dtype = attrs.pop("dtype", None)
        grid = attrs.pop("grid")
        return field_cls(grid, data=jnp.asarray(data, dtype=dtype), **attrs)  # type: ignore[call-arg]

    @classmethod
    def from_file(cls, filename: str) -> FieldBase:
        """Read a field from an HDF5 file previously written by :meth:`to_file`."""
        import h5py

        with h5py.File(filename, "r") as fp:
            if fp.attrs.get("class") == "FieldCollection":
                from .collection import FieldCollection

                count = int(fp.attrs["count"])
                fields = [cls._from_hdf_dataset(fp[f"field_{i}"]) for i in range(count)]
                label = json.loads(fp.attrs["label"]) if "label" in fp.attrs else None
                return FieldCollection(fields, label=label)
            return cls._from_hdf_dataset(fp["data"])

    # -- arithmetic --------------------------------------------------------------------------
    def _unary_operation(self, op: Callable) -> FieldBase:
        return self.__class__(self.grid, data=op(self._data), label=self.label)

    @property
    def real(self) -> FieldBase:
        return self._unary_operation(jnp.real)

    @property
    def imag(self) -> FieldBase:
        return self._unary_operation(jnp.imag)

    def conjugate(self) -> FieldBase:
        return self._unary_operation(jnp.conj)

    def __neg__(self) -> FieldBase:
        return self._unary_operation(jnp.negative)

    def _binary_operation(self, other, op: Callable, scalar_second: bool = True) -> FieldBase:
        from .collection import FieldCollection
        from .datafield_base import DataFieldBase
        from .scalar import ScalarField

        if isinstance(other, FieldCollection):
            return NotImplemented  # handled by FieldCollection reflected op
        if isinstance(other, FieldBase):
            self.grid.assert_grid_compatible(other.grid)
            if self.__class__ is other.__class__:
                result_cls = self.__class__
                data = op(self._data, other._data)
            elif isinstance(self, ScalarField) and isinstance(other, DataFieldBase):
                result_cls = other.__class__
                data = op(self._data, other._data)
            elif isinstance(other, ScalarField) and isinstance(self, DataFieldBase):
                result_cls = self.__class__
                data = op(self._data, other._data)
            else:
                raise TypeError(
                    f"Unsupported operation between {self.__class__.__name__} and "
                    f"{other.__class__.__name__}"
                )
            return result_cls(self.grid, data=data)
        # scalar or array operand
        if scalar_second and not np.isscalar(other) and not isinstance(other, jax.Array):
            other = jnp.asarray(other)
        return self.__class__(self.grid, data=op(self._data, other))

    def __add__(self, other):
        return self._binary_operation(other, jnp.add)

    __radd__ = __add__

    def __sub__(self, other):
        return self._binary_operation(other, jnp.subtract)

    def __rsub__(self, other):
        return self._binary_operation(other, lambda a, b: jnp.subtract(b, a))

    def __mul__(self, other):
        return self._binary_operation(other, jnp.multiply, scalar_second=False)

    __rmul__ = __mul__

    def __truediv__(self, other):
        return self._binary_operation(other, jnp.divide, scalar_second=False)

    def __rtruediv__(self, other):
        return self._binary_operation(other, lambda a, b: jnp.divide(b, a))

    def __pow__(self, exponent):
        if not np.isscalar(exponent):
            raise NotImplementedError("Only scalar exponents are supported")
        return self._unary_operation(lambda x: jnp.power(x, exponent))

    # in-place variants return new objects but rebind data (functional JAX style)
    def __iadd__(self, other):
        result = self.__add__(other)
        self._data = result._data
        return self

    def __isub__(self, other):
        result = self.__sub__(other)
        self._data = result._data
        return self

    def __imul__(self, other):
        result = self.__mul__(other)
        self._data = result._data
        return self

    def __itruediv__(self, other):
        result = self.__truediv__(other)
        self._data = result._data
        return self

    def split_mpi(self, decomposition="auto") -> FieldBase:
        """Shard the field data over the device mesh (reference `base.py:783`).

        The reference scatters data to MPI ranks; here the returned field's
        data is ONE global jax.Array annotated with a NamedSharding.
        """
        from ..parallel.mesh import GridMesh

        mesh = GridMesh.from_grid(self.grid, decomposition)
        return mesh.split_field(self)

    def apply(self, func, out=None, *, label: str | None = None, evaluate_args=None) -> FieldBase:
        """Apply a function or expression to the field data."""
        if isinstance(func, str):
            from ..utils.expressions_eval import evaluate

            result = evaluate(func, {self.label or "c": self}, **(evaluate_args or {}))
            result._label = label or result._label
            return result
        data = func(self._data)
        result = self.__class__(self.grid, data=data, label=label or self.label)
        if out is not None:
            out._data = result._data
            return out
        return result

    # -- plotting (implemented in subclasses) ------------------------------------------------
    def plot(self, *args, **kwargs):
        raise NotImplementedError

    def _get_napari_data(self, **kwargs):
        raise NotImplementedError

    def plot_interactive(self, viewer_args: dict | None = None, **kwargs):
        """Show the field in an interactive napari viewer (optional dependency).

        Reference: `fields/base.py:759`.
        """
        if self.grid.num_axes == 1:
            raise RuntimeError("Interactive plotting needs at least 2 spatial dimensions")
        try:
            import napari
        except ImportError as err:
            raise ImportError(
                "plot_interactive requires the optional `napari` package"
            ) from err
        viewer = napari.Viewer(**(viewer_args or {}))
        for name, layer_data in self._get_napari_data(**kwargs).items():
            layer_data = dict(layer_data)
            layer_type = layer_data.pop("type", "image")
            getattr(viewer, f"add_{layer_type}")(name=name, **layer_data)
        napari.run()
        return viewer
