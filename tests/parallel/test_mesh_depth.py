"""GridMesh depth: decomposition, subgrids, communication primitives.

Mirrors the reference's `tests/grids/test_grid_mesh.py` (293 LoC) which tests
split/combine/BC extraction without MPI.
"""

import jax
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.parallel import GridMesh, _get_optimal_decomposition

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >= 4 devices")


def test_decomposition_prime_factors():
    assert _get_optimal_decomposition([64, 64, 64], 8) == [2, 2, 2]
    assert _get_optimal_decomposition([128, 2], 4) == [4, 1]
    assert sorted(_get_optimal_decomposition([12, 18], 6)) in ([2, 3], [1, 6])


def test_mesh_rejects_indivisible():
    grid = pde.UnitGrid([10, 10])
    with pytest.raises(ValueError):
        GridMesh(grid, [3, 1])
    with pytest.raises(ValueError):
        GridMesh(grid, [2])  # wrong length


def test_mesh_too_many_devices():
    grid = pde.UnitGrid([64, 64])
    with pytest.raises(ValueError):
        GridMesh(grid, [64, 64])


def test_subgrid_geometry():
    grid = pde.CartesianGrid([(0, 4), (-1, 1)], (16, 8), periodic=True)
    mesh = GridMesh(grid, [4, 2])
    sub = mesh.subgrid
    assert sub.shape == (4, 4)
    np.testing.assert_allclose(sub.discretization, grid.discretization)
    assert tuple(sub.periodic) == tuple(grid.periodic)


def test_split_combine_roundtrip_vector(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    mesh = GridMesh(grid, [2, 2])
    field = pde.VectorField.random_uniform(grid, rng=rng)
    sharded = mesh.split_field(field)
    combined = mesh.combine_field(sharded)
    np.testing.assert_array_equal(np.asarray(combined.data),
                                  np.asarray(field.data))


def test_split_combine_roundtrip_collection(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    mesh = GridMesh(grid, [2, 2])
    fc = pde.FieldCollection([
        pde.ScalarField.random_uniform(grid, rng=rng, label="a"),
        pde.ScalarField.random_uniform(grid, rng=rng, label="b"),
    ])
    sharded = mesh.split_field(fc)
    combined = mesh.combine_field(sharded)
    for orig, back in zip(fc, combined):
        np.testing.assert_array_equal(np.asarray(back.data),
                                      np.asarray(orig.data))


def test_scatter_gather_primitives(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    mesh = GridMesh(grid, [2, 2])
    data = rng.random((8, 8))
    scattered = mesh.scatter(data)
    gathered = mesh.gather(scattered)
    np.testing.assert_array_equal(gathered, data)
    allg = mesh.allgather(scattered)
    np.testing.assert_array_equal(np.asarray(allg), data)
    assert mesh.broadcast(data) is data


def test_extract_subfield_template(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    mesh = GridMesh(grid, [2, 2])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    template = mesh.extract_subfield(field)
    assert template.grid.shape == (4, 4)
    assert template.dtype == field.dtype


def test_partition_spec_ranks():
    grid = pde.UnitGrid([8, 8], periodic=True)
    mesh = GridMesh(grid, [2, 2])
    spec0 = mesh.partition_spec(0)
    spec1 = mesh.partition_spec(1)
    assert len(spec1) == len(spec0) + 1
    assert spec1[0] is None  # tensor components replicated


def test_sharded_integral_and_mass_conservation(rng):
    """Integral of a sharded field matches the serial value exactly."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.2)
    res = eq.solve(state, t_range=0.2, dt=0.01, solver="explicit_sharded",
                   adaptive=False, decomposition=[2, 2], tracker=None)
    assert float(res.integral) == pytest.approx(float(state.integral),
                                                rel=1e-12)


def test_sharded_sde_differs_across_shards(rng):
    """Stochastic decomposed runs decorrelate the noise per shard."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField(grid, data=0.0)
    eq = pde.DiffusionPDE(0.1, noise=1.0, rng=rng)
    res = eq.solve(state, t_range=0.1, dt=0.01, solver="explicit_sharded",
                   adaptive=False, decomposition=[2, 2], tracker=None)
    data = np.asarray(res.data)
    quadrants = [data[:8, :8], data[:8, 8:], data[8:, :8], data[8:, 8:]]
    # no two quadrants should be identical (noise is decorrelated)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.allclose(quadrants[i], quadrants[j])


def test_mesh_1d_and_3d_decompositions(rng):
    g1 = pde.UnitGrid([16], periodic=True)
    m1 = GridMesh.from_grid(g1, 4)
    assert m1.decomposition == [4]
    g3 = pde.UnitGrid([4, 4, 4], periodic=True)
    m3 = GridMesh.from_grid(g3, 8)
    assert sorted(m3.decomposition) == [2, 2, 2]
    state = pde.ScalarField.random_uniform(g3, rng=rng)
    eq = pde.DiffusionPDE(0.1)
    ref = eq.solve(state, t_range=0.05, dt=0.01, tracker=None)
    res = eq.solve(state, t_range=0.05, dt=0.01, solver="explicit_sharded",
                   adaptive=False, decomposition=[2, 2, 2], tracker=None)
    np.testing.assert_array_equal(np.asarray(res.data), np.asarray(ref.data))


@pytest.mark.parametrize(
    "make_grid, decomposition",
    [
        (lambda: pde.PolarSymGrid(3, 4), [2]),
        (lambda: pde.SphericalSymGrid(3, 4), [2]),
        (lambda: pde.CylindricalSymGrid(3, (0, 3), 4, periodic_z=True), [1, 2]),
        (lambda: pde.CylindricalSymGrid(3, (0, 3), (4, 4)), [2, 1]),
    ],
    ids=["polar-r", "spherical-r", "cylindrical-z", "cylindrical-r"],
)
def test_mesh_curvilinear_grids(make_grid, decomposition, rng):
    """GridMesh decomposes curvilinear grids like the reference
    (`tests/grids/test_grid_mesh.py:21-24`): radial splits yield annular
    subgrids; split/combine round-trips the data."""
    grid = make_grid()
    mesh = GridMesh.from_grid(grid, decomposition)
    assert len(mesh) == int(np.prod(decomposition))

    # per-shard subgrids tile the global bounds without gaps
    subs = [mesh.subgrid_for(i) for i in range(len(mesh))]
    for ax in range(grid.num_axes):
        if decomposition[ax] == 1:
            continue
        edges = sorted(s.axes_bounds[ax] for s in subs)
        assert edges[0][0] == grid.axes_bounds[ax][0]
        assert edges[-1][1] == grid.axes_bounds[ax][1]
        for (lo1, hi1), (lo2, hi2) in zip(edges, edges[1:]):
            assert hi1 == lo2

    field = pde.ScalarField.random_uniform(grid, rng=rng)
    back = mesh.combine_field(mesh.split_field(field))
    np.testing.assert_array_equal(back.to_numpy(), field.to_numpy())


def test_cylindrical_z_decomposed_solve_bit_identical(rng):
    """Solving on a z-decomposed cylindrical grid matches serial bit for bit
    (stencil coefficients depend only on r, which every shard holds fully)."""
    grid = pde.CylindricalSymGrid(2.0, (0, 4), (8, 16), periodic_z=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1)
    serial = eq.solve(field, t_range=0.1, dt=0.01, tracker=None)
    sharded = eq.solve(field, t_range=0.1, dt=0.01, tracker=None,
                       decomposition=[1, 2])
    np.testing.assert_array_equal(serial.to_numpy(), sharded.to_numpy())


def test_radial_decomposed_solve_supported(rng):
    """Radial decompositions share one SPMD stepper via traced coordinate
    slices (grids.base.axis_coords_traced); full parity tests live in
    tests/parallel/test_radial_decomposition.py."""
    grid = pde.CylindricalSymGrid(2.0, (0, 4), (8, 16))
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    serial = pde.DiffusionPDE(0.1).solve(field, t_range=0.05, dt=0.01, tracker=None)
    sharded = pde.DiffusionPDE(0.1).solve(
        field, t_range=0.05, dt=0.01, tracker=None, decomposition=[2, 1]
    )
    np.testing.assert_array_equal(serial.to_numpy(), sharded.to_numpy())
