"""Halo-exchanging boundary conditions for decomposed grids.

TPU-native replacement of the reference ``_MPIBC``
(`/root/reference/pde/grids/boundaries/local.py:561`) and the numba-mpi
send/recv ghost setters (`backends/numba_mpi/backend.py:30-195`): ghost layers
along decomposed axes are filled by paired ``lax.ppermute`` shifts inside
``shard_map``; shards at the global domain edge overwrite the received halo
with the physical boundary condition, selected by ``lax.axis_index`` (SPMD —
no rank-dependent control flow).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..grids.boundaries.axes import BoundariesBase, BoundariesList
from ..grids.boundaries.local import _PeriodicBC


class ShardedBoundaries(BoundariesBase):
    """Boundary conditions on a decomposed grid: physical BCs at global edges,
    ppermute halo exchange at internal shard boundaries."""

    def __init__(self, mesh, bcs: BoundariesList):
        from .mesh import GridMesh

        self.mesh: GridMesh = mesh
        if not isinstance(bcs, BoundariesList):
            raise NotImplementedError(
                "Sharded execution requires per-axis boundary conditions"
            )
        self.rank = bcs.rank
        self.grid = mesh.subgrid
        # Coordinate-dependent boundary values would be evaluated on the SPMD
        # template grid (shard 0's coordinates) and thus be wrong on other
        # shards — reject them rather than silently miscomputing.
        from ..grids.boundaries.local import ExpressionBC

        for bc in bcs.boundaries:
            if isinstance(bc, ExpressionBC):
                expr = str(bc._input.get("value_expr", "")) + str(
                    bc._input.get("const_expr", "")
                )
                if any(ax in expr for ax in bc.grid.axes) or callable(
                    bc._input.get("value_expr")
                ):
                    raise NotImplementedError(
                        "Coordinate-dependent boundary conditions are not "
                        "supported on decomposed grids yet"
                    )
        # retarget the physical boundary conditions to the local subgrid
        self._local_bcs = bcs.to_subgrid(mesh.subgrid)
        self._global_bcs = bcs

    def __eq__(self, other):
        if not isinstance(other, ShardedBoundaries):
            return NotImplemented
        return self.mesh is other.mesh and self._global_bcs == other._global_bcs

    def __hash__(self):
        return hash((id(self.mesh), self._global_bcs))

    def get_mathematical_representation(self, field_name: str = "C") -> str:
        return self._global_bcs.get_mathematical_representation(field_name)

    def make_ghost_setter(self) -> Callable:
        mesh = self.mesh

        axis_setters: list[Callable] = []
        for a, bpair in enumerate(self._local_bcs):
            n_shards = mesh.decomposition[a]
            if n_shards == 1:
                axis_setters.append(bpair.make_ghost_setter())
                continue
            axis_setters.append(self._make_halo_exchanger(a, bpair, n_shards))

        def setter(full, t=0.0, args=None):
            for s in axis_setters:
                full = s(full, t, args)
            return full

        return setter

    def _make_halo_exchanger(self, axis: int, bpair, n_shards: int):
        """Halo exchange along one decomposed axis (rank-agnostic)."""
        mesh = self.mesh
        grid = self.grid
        axis_name = mesh.axis_names[axis]
        num_axes = grid.num_axes
        periodic = bool(grid.periodic[axis])
        flip_sign = isinstance(bpair.low, _PeriodicBC) and bpair.low.flip_sign

        def make_idx(ndim: int, pos: int):
            lead = ndim - num_axes
            sel: list[Any] = [slice(None)] * lead + [slice(1, -1)] * num_axes
            sel[lead + axis] = pos
            return tuple(sel)

        # permutation pairs: data flows shard i -> shard i+1 ("forward")
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]

        if periodic:
            sign = -1.0 if flip_sign else 1.0

            def exchange(full, t=0.0, args=None):
                write_low, write_high = make_idx(full.ndim, 0), make_idx(full.ndim, -1)
                read_low, read_high = make_idx(full.ndim, 1), make_idx(full.ndim, -2)
                from_prev = jax.lax.ppermute(full[read_high], axis_name, fwd)
                from_next = jax.lax.ppermute(full[read_low], axis_name, bwd)
                if flip_sign:
                    i = jax.lax.axis_index(axis_name)
                    from_prev = jnp.where(i == 0, sign * from_prev, from_prev)
                    from_next = jnp.where(
                        i == n_shards - 1, sign * from_next, from_next
                    )
                return full.at[write_low].set(from_prev).at[write_high].set(from_next)

            return exchange

        # non-periodic: physical BC at the global edges overrides the halo
        set_low = bpair.low.make_ghost_setter()
        set_high = bpair.high.make_ghost_setter()
        fwd_open = [(i, i + 1) for i in range(n_shards - 1)]
        bwd_open = [(i, i - 1) for i in range(1, n_shards)]

        def exchange(full, t=0.0, args=None):
            write_low, write_high = make_idx(full.ndim, 0), make_idx(full.ndim, -1)
            read_low, read_high = make_idx(full.ndim, 1), make_idx(full.ndim, -2)
            from_prev = jax.lax.ppermute(full[read_high], axis_name, fwd_open)
            from_next = jax.lax.ppermute(full[read_low], axis_name, bwd_open)
            i = jax.lax.axis_index(axis_name)
            # candidate physical ghost layers computed from local data
            phys = set_high(set_low(full, t, args), t, args)
            low_ghost = jnp.where(i == 0, phys[write_low], from_prev)
            high_ghost = jnp.where(i == n_shards - 1, phys[write_high], from_next)
            return full.at[write_low].set(low_ghost).at[write_high].set(high_ghost)

        return exchange
