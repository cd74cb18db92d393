"""Halo-exchanging boundary conditions for decomposed grids.

TPU-native replacement of the reference ``_MPIBC``
(`/root/reference/pde/grids/boundaries/local.py:561`) and the numba-mpi
send/recv ghost setters (`backends/numba_mpi/backend.py:30-195`): ghost layers
along decomposed axes are filled by paired ``lax.ppermute`` shifts inside
``shard_map``; shards at the global domain edge overwrite the received halo
with the physical boundary condition, selected by ``lax.axis_index`` (SPMD —
no rank-dependent control flow).

Inhomogeneous (spatially varying) boundary values and coordinate-dependent
expression BCs are supported by evaluating them on the GLOBAL boundary and
slicing per shard with ``lax.dynamic_slice`` keyed by the shard index — the
SPMD equivalent of the reference's ``to_subgrid`` slicing of BC value arrays
(`/root/reference/pde/grids/boundaries/local.py:368`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..grids.boundaries.axes import BoundariesBase, BoundariesList
from ..grids.boundaries.local import (
    ConstBC1stOrderBase,
    ConstBC2ndOrderBase,
    ExpressionBC,
    _PeriodicBC,
)


class ShardedBoundaries(BoundariesBase):
    """Boundary conditions on a decomposed grid: physical BCs at global edges,
    ppermute halo exchange at internal shard boundaries."""

    #: the ghost setter fills ghost-frame CORNERS itself when the 9-point
    #: stencil is configured (see _make_corner_pass) — stencils must NOT
    #: apply the serial local corner setter on top (it wraps locally, which
    #: is wrong on a cut axis)
    sets_corner_ghosts = True

    def __init__(self, mesh, bcs: BoundariesList):
        from .mesh import GridMesh

        self.mesh: GridMesh = mesh
        if not isinstance(bcs, BoundariesList):
            raise NotImplementedError(
                "Sharded execution requires per-axis boundary conditions"
            )
        self.rank = bcs.rank
        self.grid = mesh.subgrid
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
        for a, bpair in enumerate(self._global_bcs):
            n_shards = mesh.decomposition[a]
            if bpair.periodic:
                if n_shards == 1:
                    axis_setters.append(
                        bpair.to_subgrid(mesh.subgrid).make_ghost_setter()
                    )
                else:
                    axis_setters.append(
                        self._make_periodic_exchanger(a, bpair, n_shards)
                    )
                continue
            set_low = self._make_side_setter(bpair.low)
            set_high = self._make_side_setter(bpair.high)
            if n_shards == 1:
                # axis not decomposed: every shard carries both physical edges
                def both(full, t=0.0, args=None, _lo=set_low, _hi=set_high):
                    return _hi(_lo(full, t, args), t, args)

                axis_setters.append(both)
            else:
                axis_setters.append(
                    self._make_physical_exchanger(a, n_shards, set_low, set_high)
                )

        corner_pass = self._make_corner_pass()

        def setter(full, t=0.0, args=None):
            for s in axis_setters:
                full = s(full, t, args)
            if corner_pass is not None:
                full = corner_pass(full)
            return full

        if corner_pass is not None:
            setter.sets_corner_ghosts = True
        return setter

    def _make_corner_pass(self):
        """Ghost-frame CORNER values for the 9-point corner-weight stencil.

        The per-axis setters fill ghost rows/columns at interior positions
        only, and the serial corner setter (`ops/cartesian.py:
        _set_corner_points_2d`) wraps LOCALLY — wrong on a cut axis, where
        the corner value lives on the diagonal neighbor. This pass routes
        corners with the serial setter's precedence (periodic axis 0, else
        periodic axis 1, else extrapolation), fetching remote data in one
        ppermute hop off the already-filled ghost layers (two hops total —
        the same trick the fused ext kernels rely on). ``None`` (no pass,
        zero overhead) unless the 9-point stencil is configured on a 2D
        grid — 5-point stencils never read corners.
        """
        from ..utils.config import config

        if (
            self.grid.num_axes != 2
            or float(config["operators.cartesian.laplacian_2d_corner_weight"])
            == 0.0
        ):
            return None
        mesh = self.mesh
        per = [bool(bpair.periodic) for bpair in self._global_bcs]
        n0, n1 = mesh.decomposition
        names = mesh.axis_names

        def at(full, i, j):
            return (slice(None),) * (full.ndim - 2) + (i, j)

        def route(full, axis, n, circular):
            """Fill the two corners on each side of `axis` by applying the
            axis wrap/exchange to the other axis's (filled) ghost layers."""
            name = names[axis]
            for g in (0, -1):  # the OTHER axis's ghost layer index
                if axis == 0:
                    src_low = full[at(full, -2, g)]
                    src_high = full[at(full, 1, g)]
                else:
                    src_low = full[at(full, g, -2)]
                    src_high = full[at(full, g, 1)]
                if n > 1:
                    if circular:
                        fwd = [(i, (i + 1) % n) for i in range(n)]
                        bwd = [(i, (i - 1) % n) for i in range(n)]
                    else:
                        fwd = [(i, i + 1) for i in range(n - 1)]
                        bwd = [(i, i - 1) for i in range(1, n)]
                    src_low = jax.lax.ppermute(src_low, name, fwd)
                    src_high = jax.lax.ppermute(src_high, name, bwd)
                lo = at(full, 0, g) if axis == 0 else at(full, g, 0)
                hi = at(full, -1, g) if axis == 0 else at(full, g, -1)
                if circular or n == 1:
                    full = full.at[lo].set(src_low).at[hi].set(src_high)
                else:
                    # open chain: edge shards received zeros — keep their
                    # previous corner values (filled by the other route)
                    idx = jax.lax.axis_index(name)
                    full = full.at[lo].set(
                        jnp.where(idx > 0, src_low, full[lo])
                    )
                    full = full.at[hi].set(
                        jnp.where(idx < n - 1, src_high, full[hi])
                    )
            return full

        def corner_pass(full):
            if per[0]:
                # serial periodic_x branch: corners wrap along axis 0 into
                # the ghost columns (any y condition rides along in them)
                return route(full, 0, n0, circular=True)
            if per[1]:
                return route(full, 1, n1, circular=True)
            # both axes physical: inner corners along each cut axis carry
            # the neighbor's ghost-layer data; the four GLOBAL corners use
            # the serial extrapolation 0.5*(adjacent ghosts)
            full = route(full, 0, n0, circular=False)
            full = route(full, 1, n1, circular=False)
            i0 = jax.lax.axis_index(names[0]) if n0 > 1 else 0
            i1 = jax.lax.axis_index(names[1]) if n1 > 1 else 0
            at_lo0, at_hi0 = i0 == 0, i0 == n0 - 1
            at_lo1, at_hi1 = i1 == 0, i1 == n1 - 1
            for (e0, e1), (ci, cj), (ai, aj), (bi, bj) in (
                ((at_lo0, at_lo1), (0, 0), (0, 1), (1, 0)),
                ((at_hi0, at_lo1), (-1, 0), (-1, 1), (-2, 0)),
                ((at_lo0, at_hi1), (0, -1), (0, -2), (1, -1)),
                ((at_hi0, at_hi1), (-1, -1), (-1, -2), (-2, -1)),
            ):
                val = 0.5 * (full[at(full, *(ai, aj))] + full[at(full, *(bi, bj))])
                c = at(full, ci, cj)
                full = full.at[c].set(jnp.where(e0 & e1, val, full[c]))
            return full

        return corner_pass

    # -- per-side physical setters ---------------------------------------------------
    def _make_slice_boundary(self, axis: int) -> Callable:
        """Return ``slice_boundary(arr)`` extracting this shard's part of an
        array defined over the global boundary hyperplane of ``axis``
        (trailing dims = the other grid axes; leading dims pass through)."""
        mesh = self.mesh
        sub = self.grid
        other_axes = [a for a in range(sub.num_axes) if a != axis]

        def slice_boundary(arr):
            arr = jnp.asarray(arr)
            if arr.ndim == 0 or not other_axes:
                return arr
            nb = len(other_axes)
            lead = arr.ndim - nb
            starts = [0] * lead + [
                jax.lax.axis_index(mesh.axis_names[a]) * sub.shape[a]
                for a in other_axes
            ]
            sizes = list(arr.shape[:lead]) + [sub.shape[a] for a in other_axes]
            return jax.lax.dynamic_slice(arr, starts, sizes)

        return slice_boundary

    def _make_side_setter(self, bc) -> Callable:
        """Ghost setter for one physical boundary side, valid on every shard.

        Homogeneous conditions retarget to the SPMD subgrid directly.
        Inhomogeneous values and expression BCs evaluate on the global
        boundary and are sliced per shard (must run inside ``shard_map``).
        """
        axis = bc.axis
        if isinstance(bc, ExpressionBC):
            # expressions see grid coordinates: always evaluate with the
            # shard's true global coordinates (a subgrid copy would evaluate
            # the template shard's coordinates everywhere)
            slice_boundary = self._make_slice_boundary(axis)
            dx = float(bc.grid.discretization[axis])
            if bc.value_cell is None:
                read_offset = 0
            else:
                edge = bc.grid.shape[axis] - 1 if bc.upper else 0
                read_offset = abs(bc.value_cell - edge)
            bc_coords = bc.grid._boundary_coordinates(axis, bc.upper)
            coord_arrays = tuple(
                jnp.asarray(bc_coords[..., i]) for i in range(bc.grid.num_axes)
            )
            func = bc._func

            def expr_setter(full, t=0.0, args=None):
                write_t, read_t = bc._ghost_indices(
                    full.ndim, read_offset=read_offset
                )
                coords = tuple(slice_boundary(c) for c in coord_arrays)
                adjacent = full[read_t]
                ghost = func(adjacent, dx, *coords, t)
                return full.at[write_t].set(
                    jnp.broadcast_to(ghost, adjacent.shape)
                )

            return expr_setter
        try:
            return bc.to_subgrid(self.grid).make_ghost_setter()
        except NotImplementedError:
            pass
        slice_boundary = self._make_slice_boundary(axis)
        edge = bc.grid.shape[axis] - 1 if bc.upper else 0
        if isinstance(bc, ConstBC1stOrderBase):
            const, factor, index = bc.get_virtual_point_data()
            offset = abs(index - edge)

            def setter(full, t=0.0, args=None):
                write_t, read_t = bc._ghost_indices(full.ndim, read_offset=offset)
                ghost = slice_boundary(const) + slice_boundary(factor) * full[read_t]
                return full.at[write_t].set(
                    jnp.broadcast_to(ghost, full[read_t].shape)
                )

            return setter
        if isinstance(bc, ConstBC2ndOrderBase):
            const, f1, i1, f2, i2 = bc.get_virtual_point_data()
            off1, off2 = abs(i1 - edge), abs(i2 - edge)

            def setter2(full, t=0.0, args=None):
                write_t, read1_t = bc._ghost_indices(full.ndim, read_offset=off1)
                _, read2_t = bc._ghost_indices(full.ndim, read_offset=off2)
                ghost = (
                    slice_boundary(const)
                    + slice_boundary(f1) * full[read1_t]
                    + slice_boundary(f2) * full[read2_t]
                )
                return full.at[write_t].set(
                    jnp.broadcast_to(ghost, full[read1_t].shape)
                )

            return setter2
        raise NotImplementedError(
            f"Boundary condition {type(bc).__name__} is not supported on "
            "decomposed grids"
        )

    # -- halo exchangers ---------------------------------------------------------------
    def _make_idx(self, axis: int, ndim: int, pos: int):
        lead = ndim - self.grid.num_axes
        sel: list[Any] = [slice(None)] * lead + [slice(1, -1)] * self.grid.num_axes
        sel[lead + axis] = pos
        return tuple(sel)

    def _make_periodic_exchanger(self, axis: int, bpair, n_shards: int):
        """Periodic halo exchange along one decomposed axis (rank-agnostic)."""
        mesh = self.mesh
        axis_name = mesh.axis_names[axis]
        flip_sign = isinstance(bpair.low, _PeriodicBC) and bpair.low.flip_sign

        # permutation pairs: data flows shard i -> shard i+1 ("forward")
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        sign = -1.0 if flip_sign else 1.0

        def exchange(full, t=0.0, args=None):
            write_low = self._make_idx(axis, full.ndim, 0)
            write_high = self._make_idx(axis, full.ndim, -1)
            read_low = self._make_idx(axis, full.ndim, 1)
            read_high = self._make_idx(axis, full.ndim, -2)
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

    def _make_physical_exchanger(
        self, axis: int, n_shards: int, set_low: Callable, set_high: Callable
    ):
        """Halo exchange along a decomposed non-periodic axis: physical BCs
        override the received halo at the global edges."""
        mesh = self.mesh
        axis_name = mesh.axis_names[axis]
        fwd_open = [(i, i + 1) for i in range(n_shards - 1)]
        bwd_open = [(i, i - 1) for i in range(1, n_shards)]

        def exchange(full, t=0.0, args=None):
            write_low = self._make_idx(axis, full.ndim, 0)
            write_high = self._make_idx(axis, full.ndim, -1)
            read_low = self._make_idx(axis, full.ndim, 1)
            read_high = self._make_idx(axis, full.ndim, -2)
            from_prev = jax.lax.ppermute(full[read_high], axis_name, fwd_open)
            from_next = jax.lax.ppermute(full[read_low], axis_name, bwd_open)
            i = jax.lax.axis_index(axis_name)
            # candidate physical ghost layers computed from local data
            phys = set_high(set_low(full, t, args), t, args)
            low_ghost = jnp.where(i == 0, phys[write_low], from_prev)
            high_ghost = jnp.where(i == n_shards - 1, phys[write_high], from_next)
            return full.at[write_low].set(low_ghost).at[write_high].set(high_ghost)

        return exchange
