"""Domain decomposition over a JAX device mesh.

TPU-native re-design of the reference ``GridMesh`` (`/root/reference/pde/grids/
_mesh.py:168`): instead of MPI ranks with explicit scatter/gather, the grid is
decomposed over a :class:`jax.sharding.Mesh`; field data lives as one global
``jax.Array`` sharded along the grid axes, and halo exchange happens via
``lax.ppermute`` inside ``shard_map`` (`SURVEY.md §2.9`). The reference's
per-rank subgrids map to one SPMD *local template grid* whose boundary
conditions are swapped for halo-exchanging ones
(:class:`~pde_tpu.parallel.boundaries.ShardedBoundaries`), mirroring the
``_MPIBC`` injection at `grids/_mesh.py:535-569`.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..fields.base import FieldBase
from ..fields.collection import FieldCollection
from ..grids.base import GridBase


def _get_optimal_decomposition(shape: Sequence[int], num: int) -> list[int]:
    """Distribute `num` devices over the grid axes (reference `_mesh.py:59`).

    Greedily assigns prime factors of `num` to the currently largest axis,
    requiring that each axis size stays divisible by its chunk count.
    """
    decomposition = [1] * len(shape)
    # prime factorization of num
    factors = []
    n = num
    for p in range(2, int(math.isqrt(n)) + 1):
        while n % p == 0:
            factors.append(p)
            n //= p
    if n > 1:
        factors.append(n)
    sizes = [s for s in shape]
    for f in sorted(factors, reverse=True):
        # pick the axis with the largest local size that remains divisible
        order = sorted(range(len(shape)), key=lambda i: -sizes[i])
        for i in order:
            if sizes[i] % f == 0:
                decomposition[i] *= f
                sizes[i] //= f
                break
        else:
            raise ValueError(
                f"Cannot decompose grid of shape {tuple(shape)} over {num} devices"
            )
    return decomposition


class GridMesh:
    """Splits a grid over a device mesh for SPMD execution."""

    def __init__(self, basegrid: GridBase, decomposition: Sequence[int], devices=None):
        self.basegrid = basegrid
        self.decomposition = list(decomposition)
        if len(self.decomposition) != basegrid.num_axes:
            raise ValueError("Decomposition length must match the number of grid axes")
        for n, size in zip(self.decomposition, basegrid.shape, strict=True):
            if size % n != 0:
                raise ValueError(
                    f"Axis of size {size} cannot be split into {n} equal chunks"
                )
        if devices is None:
            devices = jax.devices()
        num = int(np.prod(self.decomposition))
        if num > len(devices):
            raise ValueError(
                f"Decomposition {self.decomposition} needs {num} devices, "
                f"got {len(devices)}"
            )
        device_array = np.asarray(devices[:num]).reshape(self.decomposition)
        self.axis_names = tuple(f"mesh_{ax}" for ax in basegrid.axes)
        self.jax_mesh = Mesh(device_array, self.axis_names)

    @classmethod
    def from_grid(
        cls, grid: GridBase, decomposition="auto", devices=None
    ) -> GridMesh:
        """Create a mesh from a grid (reference `_mesh.py:194`)."""
        if devices is None:
            devices = jax.devices()
        if decomposition == "auto" or decomposition is None:
            decomposition = _get_optimal_decomposition(grid.shape, len(devices))
        elif isinstance(decomposition, int):
            decomposition = _get_optimal_decomposition(grid.shape, decomposition)
        return cls(grid, decomposition, devices=devices)

    # -- basic properties --------------------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.decomposition)

    def __len__(self) -> int:
        """Total number of shards."""
        return int(np.prod(self.decomposition))

    @property
    def current_grid(self) -> GridBase:
        return self.subgrid

    # -- subgrid -----------------------------------------------------------------------
    @property
    def subgrid(self) -> GridBase:
        """The SPMD local template grid (all shards share its static shape)."""
        if not hasattr(self, "_subgrid"):
            self._subgrid = self._make_subgrid()
        return self._subgrid

    def _make_subgrid(self) -> GridBase:
        sub = self.subgrid_for(0)
        sub._mesh = self
        return sub

    def subgrid_for(self, index) -> GridBase:
        """Subgrid covering shard `index` (flat rank or per-axis tuple).

        Mirrors the reference's per-rank subgrids (`_mesh.py:481`); shard 0's
        subgrid serves as the SPMD template. Works for all grid classes:
        radial splits of polar/spherical/cylindrical grids produce annular
        subgrids via their ``(r_inner, r_outer)`` constructors.
        """
        from ..grids.cartesian import CartesianGrid
        from ..grids.cylindrical import CylindricalSymGrid
        from ..grids.spherical import SphericalSymGridBase

        grid = self.basegrid
        if isinstance(index, (int, np.integer)):
            index = np.unravel_index(int(index), self.decomposition)
        local_shape = [
            size // n for size, n in zip(grid.shape, self.decomposition, strict=True)
        ]
        bounds = []
        for (lo, hi), n, i in zip(
            grid.axes_bounds, self.decomposition, index, strict=True
        ):
            length = (hi - lo) / n
            bounds.append((lo + i * length, lo + (i + 1) * length))
        if isinstance(grid, CartesianGrid):
            return CartesianGrid(bounds, local_shape, periodic=grid.periodic)
        if isinstance(grid, SphericalSymGridBase):
            return grid.__class__(bounds[0], local_shape[0])
        if isinstance(grid, CylindricalSymGrid):
            return CylindricalSymGrid(
                bounds[0], bounds[1], local_shape, periodic_z=grid.periodic[1]
            )
        raise NotImplementedError(
            f"Domain decomposition is not implemented for {grid.__class__.__name__}"
        )

    # -- shardings ------------------------------------------------------------------------
    def sharding(self, rank: int = 0) -> NamedSharding:
        """NamedSharding for field data of the given tensorial rank."""
        spec = PartitionSpec(*([None] * rank), *self.axis_names)
        return NamedSharding(self.jax_mesh, spec)

    def partition_spec(self, rank: int = 0) -> PartitionSpec:
        return PartitionSpec(*([None] * rank), *self.axis_names)

    def shard_field_data(self, field: FieldBase):
        """Place field data on the device mesh, sharded along the grid axes."""
        if isinstance(field, FieldCollection):
            return [self.shard_field_data(f) for f in field]
        return jax.device_put(field.data, self.sharding(field.rank))

    def split_field(self, field: FieldBase) -> FieldBase:
        """Return a copy of `field` whose data is sharded over the mesh.

        Unlike the reference's MPI scatter (`_mesh.py:571`), this is a sharding
        annotation — the global array abstraction is preserved.
        """
        result = field.copy()
        if isinstance(result, FieldCollection):
            for f in result:
                f._data = jax.device_put(f.data, self.sharding(f.rank))
        else:
            result._data = jax.device_put(result.data, self.sharding(result.rank))
        return result

    def combine_field(self, field: FieldBase) -> FieldBase:
        """Return a fully replicated (gathered) copy of a sharded field."""
        result = field.copy()
        leaves = jax.tree_util.tree_leaves(result)
        gathered = [np.asarray(x) for x in leaves]
        import jax.numpy as jnp

        treedef = jax.tree_util.tree_structure(result)
        return jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(g) for g in gathered]
        )

    def extract_subfield(self, field: FieldBase) -> FieldBase:
        """Template field on the local subgrid (used to trace per-shard code)."""
        import jax.numpy as jnp

        # NOTE: shards share the compiled stepper traced on the shard-0
        # template; shard-VARYING data (radial stencil coefficients,
        # coordinates, volume factors) is handled by the traced helpers in
        # grids.base (axis_coords_traced & friends), which slice the GLOBAL
        # arrays by lax.axis_index inside shard_map — every grid class
        # decomposes along every axis, including radial ones. Code that bakes
        # template-grid coordinate data at trace time instead of using those
        # helpers would silently diverge on decomposed runs.
        sub = self.subgrid
        if isinstance(field, FieldCollection):
            return FieldCollection(
                [self.extract_subfield(f) for f in field], label=field.label
            )
        local_shape = (field.grid.dim,) * field.rank + tuple(sub.shape)
        data = jnp.zeros(local_shape, dtype=field.dtype)
        return field.__class__(sub, data=data, label=field.label)

    # -- communication primitives (reference `_mesh.py:749-808`) ---------------------
    def broadcast(self, data):
        """Broadcast host data to all shards (identity under SPMD: the single
        logical program already sees the value everywhere)."""
        return data

    def gather(self, data):
        """Gather a sharded array to the host (replaces MPI gather)."""
        return np.asarray(data)

    def allgather(self, data):
        """All-gather a sharded array; under the global-array abstraction the
        gathered value is available to the whole program."""
        import jax.numpy as jnp

        return jnp.asarray(np.asarray(data))

    def scatter(self, data, rank: int = 0):
        """Scatter host data over the mesh (a sharding annotation, not a copy
        per rank)."""
        import jax.numpy as jnp

        return jax.device_put(jnp.asarray(data), self.sharding(rank))

    def split_field_data(self, field_data, rank: int = 0):
        """Shard raw field data over the mesh (reference `_mesh.py:571`)."""
        return self.scatter(field_data, rank)

    def combine_field_data(self, field_data):
        """Combine sharded field data into one host array (reference `_mesh.py:698`)."""
        return self.gather(field_data)

    def extract_boundary_conditions(self, bcs):
        """Swap in halo-exchanging boundary conditions on the subgrid.

        Mirrors `_mesh.py:535-569` where outer BCs are retargeted to the
        subgrid and inner boundaries become `_MPIBC` halo exchanges.
        """
        from .boundaries import ShardedBoundaries

        return ShardedBoundaries(self, bcs)
