"""Collections of fields — coupled multi-field states.

TPU-native re-design of `/root/reference/pde/fields/collection.py:29`. The
reference stores all fields in one flat array with per-field slices; here the
collection is a **pytree of per-field arrays**, which JAX handles natively in
``jit``/``scan``/``shard_map``. A packed view (:attr:`data`) is provided for
code that needs one block array.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..grids.base import GridBase
from .base import FieldBase
from .datafield_base import DataFieldBase
from .scalar import ScalarField


class FieldCollection(FieldBase):
    """Collection of fields defined on the same grid."""

    def __init__(
        self,
        fields,
        *,
        copy_fields: bool = False,
        label: str | None = None,
        labels=None,
        dtype=None,
    ):
        if isinstance(fields, FieldCollection):
            fields = fields.fields
        if isinstance(fields, dict):
            labels = list(fields.keys()) if labels is None else labels
            fields = list(fields.values())
        fields = list(fields)
        if len(fields) == 0:
            raise ValueError("At least one field must be defined")
        grid = fields[0].grid
        for f in fields:
            if not isinstance(f, DataFieldBase):
                raise RuntimeError(
                    "Field collections only support DataFieldBase instances"
                )
            if f.grid != grid:
                raise RuntimeError("Fields are not defined on the same grid")
        if copy_fields:
            fields = [f.copy() for f in fields]
        if dtype is not None:
            fields = [f.copy(dtype=dtype) for f in fields]
        self._fields = tuple(fields)
        self._grid = grid
        self._label = label
        if labels is not None:
            if len(labels) != len(fields):
                raise ValueError("Number of labels must equal number of fields")
            for f, lbl in zip(self._fields, labels, strict=True):
                f._label = lbl

    def append(self, *fields, label: str | None = None) -> FieldCollection:
        """Return a new collection with the given fields/collections appended.

        Data of all fields is copied. Reference: `fields/collection.py:575`.
        """
        new_fields: list[DataFieldBase] = list(self._fields)
        for field in fields:
            if isinstance(field, FieldCollection):
                new_fields.extend(field.fields)
            else:
                new_fields.append(field)
        return FieldCollection(
            new_fields, copy_fields=True, label=self.label if label is None else label
        )

    # -- pytree protocol ------------------------------------------------------------------
    def _tree_flatten(self):
        return tuple(self._fields), (self._grid, self._label)

    @classmethod
    def _tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._grid, obj._label = aux
        obj._fields = tuple(children)
        return obj

    # -- container protocol ------------------------------------------------------------------
    @property
    def fields(self) -> tuple[DataFieldBase, ...]:
        return self._fields

    def __len__(self) -> int:
        return len(self._fields)

    def __iter__(self) -> Iterator[DataFieldBase]:
        return iter(self._fields)

    def __getitem__(self, index) -> DataFieldBase:
        if isinstance(index, str):
            for f in self._fields:
                if f.label == index:
                    return f
            raise KeyError(f"No field with label `{index}`")
        return self._fields[index]

    def __setitem__(self, index, value):
        fields = list(self._fields)
        if isinstance(index, str):
            for i, f in enumerate(fields):
                if f.label == index:
                    index = i
                    break
            else:
                raise KeyError(f"No field with label `{index}`")
        if isinstance(value, DataFieldBase):
            fields[index] = value
        else:
            f = fields[index]
            fields[index] = f.__class__(f.grid, data=jnp.broadcast_to(
                jnp.asarray(value, dtype=f.dtype), f.data.shape), label=f.label)
        self._fields = tuple(fields)

    @property
    def labels(self) -> list[str | None]:
        return [f.label for f in self._fields]

    @labels.setter
    def labels(self, values):
        if len(values) != len(self._fields):
            raise ValueError("Number of labels must equal number of fields")
        for f, lbl in zip(self._fields, values, strict=True):
            f._label = lbl

    # -- data views -----------------------------------------------------------------------------
    @property
    def data(self):
        """Packed block array stacking all field components (read-only view)."""
        blocks = [
            jnp.reshape(f.data, (-1,) + tuple(self.grid.shape)) for f in self._fields
        ]
        return jnp.concatenate(blocks, axis=0)

    @data.setter
    def data(self, value):
        value = jnp.asarray(value)
        fields = []
        offset = 0
        for f in self._fields:
            n = int(np.prod((self.grid.dim,) * f.rank)) if f.rank else 1
            block = value[offset : offset + n].reshape(f.data.shape)
            fields.append(f.__class__(f.grid, data=block.astype(f.dtype), label=f.label))
            offset += n
        self._fields = tuple(fields)

    @property
    def _slices(self) -> list[slice]:
        """Slices of each field in the packed block array."""
        slices = []
        offset = 0
        for f in self._fields:
            n = int(np.prod((self.grid.dim,) * f.rank)) if f.rank else 1
            slices.append(slice(offset, offset + n))
            offset += n
        return slices

    @property
    def dtype(self):
        return np.result_type(*(f.dtype for f in self._fields))

    @property
    def is_complex(self) -> bool:
        return np.issubdtype(self.dtype, np.complexfloating)

    # -- constructors ----------------------------------------------------------------------------
    @classmethod
    def from_scalar_expressions(
        cls, grid: GridBase, expressions, *, user_funcs=None, consts=None,
        label: str | None = None, labels=None, dtype=None,
    ) -> FieldCollection:
        """Create a collection of scalar fields from expressions."""
        if isinstance(expressions, str):
            expressions = [expressions]
        fields = [
            ScalarField.from_expression(
                grid, expr, user_funcs=user_funcs, consts=consts, dtype=dtype
            )
            for expr in expressions
        ]
        return cls(fields, label=label, labels=labels)

    @classmethod
    def scalar_random_uniform(
        cls, num_fields: int, grid: GridBase, vmin: float = 0, vmax: float = 1,
        *, label: str | None = None, labels=None, rng=None,
    ) -> FieldCollection:
        """Create a collection of uniformly random scalar fields."""
        rng = np.random.default_rng(rng)
        fields = [
            ScalarField.random_uniform(grid, vmin, vmax, rng=rng)
            for _ in range(num_fields)
        ]
        return cls(fields, label=label, labels=labels)

    @classmethod
    def from_dict(cls, fields: dict[str, DataFieldBase], *, label=None, dtype=None):
        return cls(list(fields.values()), labels=list(fields.keys()), label=label, dtype=dtype)

    # -- copies / comparison ----------------------------------------------------------------------
    def copy(self, *, label: str | None = None, dtype=None) -> FieldCollection:
        return FieldCollection(
            [f.copy(dtype=dtype) for f in self._fields],
            label=label or self.label,
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, FieldCollection):
            return NotImplemented
        return len(self) == len(other) and all(
            a == b for a, b in zip(self._fields, other._fields, strict=True)
        )

    def __hash__(self):
        return id(self)

    def assert_field_compatible(self, other, accept_scalar: bool = False):
        if not isinstance(other, FieldCollection):
            raise TypeError("Can only combine collections with collections")
        if len(self) != len(other):
            raise ValueError("Collections have different number of fields")
        for a, b in zip(self._fields, other._fields, strict=True):
            a.assert_field_compatible(b, accept_scalar=accept_scalar)

    def __repr__(self) -> str:
        fields = ", ".join(repr(f) for f in self._fields)
        return f"{self.__class__.__name__}({fields})"

    # -- serialization ---------------------------------------------------------------------------------
    @property
    def attributes(self) -> dict[str, Any]:
        return {
            "class": self.__class__.__name__,
            "fields": [f.attributes for f in self._fields],
            "label": self.label,
        }

    @property
    def attributes_serialized(self) -> dict[str, str]:
        return {
            "class": json.dumps(self.__class__.__name__),
            "fields": json.dumps([f.attributes_serialized for f in self._fields]),
            "label": json.dumps(self.label),
        }

    @classmethod
    def unserialize_attributes(cls, attributes: dict[str, str]) -> dict[str, Any]:
        from .base import _unserialize_scalar

        result: dict[str, Any] = {}
        for key, value in attributes.items():
            if key == "fields":
                result[key] = [
                    FieldBase._subclasses[
                        _unserialize_scalar(a["class"])
                    ].unserialize_attributes(a)
                    for a in json.loads(value)
                ]
            elif key == "label":
                result[key] = json.loads(value)
            else:
                result[key] = value
        return result

    @classmethod
    def from_state_data(cls, attributes: dict[str, Any], data=None) -> FieldCollection:
        attributes = dict(attributes)
        attributes.pop("class", None)
        field_attrs = attributes.pop("fields")
        fields = []
        offset = 0
        for fa in field_attrs:
            fa = dict(fa)
            fa.pop("class", None)
            fa.pop("dtype", None)
            grid = fa.pop("grid")
            if isinstance(grid, str):
                grid = GridBase.from_state(grid)
            # infer rank from remaining metadata is not possible generally;
            # fall back to ScalarField when data is None
            fields.append(ScalarField(grid, **fa))
        collection = cls(fields, **attributes)
        if data is not None:
            collection.data = jnp.asarray(data)
        return collection

    def apply(self, func, out=None, *, label: str | None = None, evaluate_args=None):
        """Apply a function/expression; field labels name the fields in expressions.

        Reference: `fields/base.py:653` — a string is evaluated with
        :func:`~pde_tpu.utils.expressions_eval.evaluate` over the labeled
        fields (the result is a single field); a callable is applied to the
        packed ``.data`` view and returns a new collection.
        """
        if isinstance(func, str):
            from ..utils.expressions_eval import evaluate

            fields = {f.label: f for f in self._fields if f.label is not None}
            result = evaluate(func, fields, **(evaluate_args or {}))
            if label is not None:
                result._label = label
        else:
            result = self.copy(label=label or self.label)
            result.data = func(self.data)
        if out is not None:
            out.data = result.data
            return out
        return result

    def _write_hdf_dataset(self, hdf_path, **kwargs) -> None:
        for i, f in enumerate(self._fields):
            f._write_hdf_dataset(hdf_path, key=f"field_{i}")
        hdf_path.attrs["class"] = self.__class__.__name__
        hdf_path.attrs["label"] = json.dumps(self.label)
        hdf_path.attrs["count"] = len(self._fields)

    # -- arithmetic -------------------------------------------------------------------------------------
    def _binary_operation(self, other, op, scalar_second: bool = True) -> FieldCollection:
        if isinstance(other, FieldCollection):
            if len(self) != len(other):
                raise ValueError("Collections have different number of fields")
            fields = [
                a._binary_operation(b, op, scalar_second)
                for a, b in zip(self._fields, other._fields, strict=True)
            ]
        else:
            fields = [f._binary_operation(other, op, scalar_second) for f in self._fields]
        return FieldCollection(fields, label=self.label)

    def _unary_operation(self, op) -> FieldCollection:
        return FieldCollection(
            [f._unary_operation(op) for f in self._fields], label=self.label
        )

    # -- reductions ----------------------------------------------------------------------------------------
    @property
    def integrals(self) -> list:
        return [f.integral for f in self._fields]

    @property
    def averages(self) -> list:
        return [f.average for f in self._fields]

    @property
    def magnitudes(self) -> np.ndarray:
        return np.fromiter((f.magnitude for f in self._fields), dtype=float)

    def smooth(self, sigma: float = 1, *, out=None, label=None) -> FieldCollection:
        result = FieldCollection(
            [f.smooth(sigma) for f in self._fields], label=label or self.label
        )
        if out is not None:
            out._fields = result._fields
            return out
        return result

    def interpolate_to_grid(self, grid: GridBase, *, fill=None, label=None):
        return FieldCollection(
            [f.interpolate_to_grid(grid, fill=fill) for f in self._fields],
            label=label or self.label,
        )

    # -- plotting --------------------------------------------------------------------------------------------
    def plot(self, kind: str = "auto", *args, filename=None, ax=None, fig=None,
             **kwargs):
        """Plot all fields in a row of panels.

        A caller-supplied ``ax`` (e.g. PlotTracker's live-update figure) is
        replaced by a row of panels in its figure — a collection needs one
        axes per field, so the single axes cannot be reused directly.
        """
        import matplotlib.pyplot as plt

        n = len(self._fields)
        if ax is not None and fig is None:
            fig = ax.figure
            ax.remove()
        if fig is not None:
            axes = fig.subplots(1, n)
        else:
            fig, axes = plt.subplots(1, n, figsize=(4 * n, 3.5))
        if n == 1:
            axes = [axes]
        refs = []
        for f, ax in zip(self._fields, axes, strict=True):
            if isinstance(kind, (list, tuple)):
                k = kind[refs.__len__()]
            else:
                k = kind
            refs.append(f.plot(k, *args, ax=ax, **kwargs))
        if self.label:
            fig.suptitle(self.label)
        if filename:
            fig.savefig(filename)
        return refs

    def _update_plot(self, references) -> None:
        """Update a multi-panel plot produced by :meth:`plot` in place."""
        for field, ref in zip(self._fields, references, strict=True):
            field._update_plot(ref)

    def _get_napari_data(self, **kwargs):
        result = {}
        for f in self._fields:
            result.update(f._get_napari_data(**kwargs))
        return result
