"""Contracts of the shard-aware traced grid-data helpers (grids.base).

These helpers are what make SPMD radial decompositions bit-identical to
serial runs: inside ``shard_map`` they slice host-precomputed GLOBAL arrays
by ``lax.axis_index``; outside they fall back to the template's static data
(eager shape probing). See docs/DESIGN.md "Shard-varying data".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.grids.base import (
    axis_coords_traced,
    cell_coords_traced,
    cell_volumes_traced,
    local_slice_traced,
    radial_factor_traced,
)
from pde_tpu.parallel import GridMesh


def _run_sharded(mesh, fn, out_rank=1):
    """Evaluate fn() per shard inside shard_map; returns stacked results."""
    from jax.sharding import PartitionSpec as P

    n = len(mesh)

    def body():
        return fn()[None]  # add a shard axis

    spec = P(*mesh.axis_names)
    out = jax.jit(
        jax.shard_map(
            body, mesh=mesh.jax_mesh, in_specs=(),
            out_specs=P(mesh.axis_names[0]), check_vma=False,
        )
    )()
    return np.asarray(out)


def test_axis_coords_plain_grid():
    grid = pde.PolarSymGrid(1.0, 16)
    np.testing.assert_array_equal(
        np.asarray(axis_coords_traced(grid)), grid.axes_coords[0]
    )


def test_axis_coords_template_outside_shard_map():
    """Outside shard_map the template's own (shard-0) coordinates return."""
    mesh = GridMesh(pde.PolarSymGrid(1.0, 16), [4])
    sub = mesh.subgrid
    np.testing.assert_array_equal(
        np.asarray(axis_coords_traced(sub)), sub.axes_coords[0]
    )


def test_axis_coords_sliced_per_shard():
    """Inside shard_map every shard gets its own slice of the GLOBAL array,
    bitwise equal to the serial coordinates."""
    grid = pde.PolarSymGrid(1.0, 16)
    mesh = GridMesh(grid, [4])
    sub = mesh.subgrid
    per_shard = _run_sharded(mesh, lambda: axis_coords_traced(sub))
    np.testing.assert_array_equal(
        per_shard.reshape(-1), grid.axes_coords[0]
    )


def test_radial_factor_matches_numpy():
    """Factors are computed in NUMPY on the global coords and sliced —
    never traced arithmetic (constant folding differs from runtime at ulp
    level; see radial_factor_traced docstring)."""
    grid = pde.SphericalSymGrid(1.0, 16)
    mesh = GridMesh(grid, [2])
    sub = mesh.subgrid
    compute = lambda rs: 1.0 / (2.0 * rs * 0.0625)
    per_shard = _run_sharded(mesh, lambda: radial_factor_traced(sub, compute))
    np.testing.assert_array_equal(
        per_shard.reshape(-1), compute(np.asarray(grid.axes_coords[0]))
    )


def test_cell_volumes_sliced_per_shard():
    grid = pde.PolarSymGrid(1.0, 16)
    mesh = GridMesh(grid, [4])
    sub = mesh.subgrid
    per_shard = _run_sharded(mesh, lambda: cell_volumes_traced(sub))
    serial = np.broadcast_to(grid.cell_volumes, grid.shape)
    np.testing.assert_allclose(per_shard.reshape(-1), serial, rtol=1e-12)


def test_cell_coords_sliced_per_shard_2d():
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (8, 8), periodic=True)
    mesh = GridMesh(grid, [2, 1])
    sub = mesh.subgrid
    per_shard = _run_sharded(
        mesh, lambda: jnp.stack(cell_coords_traced(sub), axis=-1)
    )
    np.testing.assert_array_equal(
        per_shard.reshape(8, 8, 2), grid.cell_coords
    )


def test_local_slice_traced():
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (8, 8), periodic=True)
    mesh = GridMesh(grid, [2, 1])
    sub = mesh.subgrid
    global_data = np.arange(64, dtype=float).reshape(8, 8)
    per_shard = _run_sharded(mesh, lambda: local_slice_traced(sub, global_data))
    np.testing.assert_array_equal(per_shard.reshape(8, 8), global_data)
    # identity when the data does not span the global grid
    small = np.ones((4, 8))
    np.testing.assert_array_equal(
        np.asarray(local_slice_traced(sub, small)), small
    )
    # rank-leading axes are kept whole
    vec = np.stack([global_data, -global_data])
    per_shard_v = _run_sharded(
        mesh, lambda: local_slice_traced(sub, vec, rank=1)[0]
    )
    np.testing.assert_array_equal(per_shard_v.reshape(8, 8), global_data)
