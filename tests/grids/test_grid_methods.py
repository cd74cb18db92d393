"""Grid method coverage across all grid classes.

Extends toward the reference's grid suites (`/root/reference/tests/grids/`):
cell volumes, transforms, random points, mirror points, serialization.
"""

import numpy as np
import pytest

import pde_tpu as pde


def _grids():
    return [
        pde.UnitGrid([8], periodic=True),
        pde.CartesianGrid([(0, 2), (0, 1)], (6, 4), periodic=[True, False]),
        pde.CartesianGrid([(0, 1)] * 3, 4),
        pde.PolarSymGrid(3, 8),
        pde.SphericalSymGrid(3, 8),
        pde.CylindricalSymGrid(2, (0, 3), (4, 6)),
    ]


GRID_IDS = ["unit1d", "cartesian2d", "cartesian3d", "polar", "spherical",
            "cylindrical"]


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_cell_volumes_sum_to_total(grid):
    total = float(np.sum(np.asarray(grid.cell_volumes)))
    assert total == pytest.approx(grid.volume, rel=1e-10)


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_integrate_constant(grid):
    field = pde.ScalarField(grid, data=2.0)
    assert float(field.integral) == pytest.approx(2.0 * grid.volume, rel=1e-10)


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_from_state_roundtrip(grid):
    state = grid.state_serialized
    restored = pde.GridBase.from_state(state)
    assert restored == grid
    assert restored.shape == grid.shape


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_random_points_inside(grid, rng):
    for _ in range(5):
        point = grid.get_random_point(rng=rng)
        # transform to grid coordinates and verify the point lies in bounds
        grid_pt = grid.transform(point, "cartesian", "grid")
        for x, (lo, hi) in zip(np.atleast_1d(grid_pt), grid.axes_bounds):
            assert lo - 1e-9 <= x <= hi + 1e-9


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_transform_roundtrip(grid, rng):
    point = grid.get_random_point(rng=rng)
    grid_pt = grid.transform(point, "cartesian", "grid")
    back = grid.transform(grid_pt, "grid", "cartesian")
    # rotationally symmetric grids lose the angular information; compare radii
    if isinstance(grid, pde.CartesianGrid):
        np.testing.assert_allclose(np.atleast_1d(back), np.atleast_1d(point),
                                   atol=1e-9)
    else:
        np.testing.assert_allclose(
            np.linalg.norm(np.atleast_1d(back)[: grid.dim]),
            np.linalg.norm(np.atleast_1d(point)[: grid.dim]),
            rtol=1e-9,
        )


def test_iter_mirror_points():
    grid = pde.UnitGrid([4, 4], periodic=[True, False])
    point = np.array([1.0, 1.0])
    mirrors = list(grid.iter_mirror_points(point, with_self=False))
    assert len(mirrors) >= 2  # periodic images along x at least
    for m in mirrors:
        assert not np.allclose(m, point)


def test_grid_slicing():
    grid = pde.CartesianGrid([(0, 4), (0, 2)], (8, 4), periodic=[True, False])
    sub = grid.slice([0])
    assert sub.num_axes == 1
    assert sub.shape == (8,)
    assert sub.periodic[0]


def test_unit_grid_basics():
    grid = pde.UnitGrid([3, 4])
    np.testing.assert_allclose(grid.discretization, [1.0, 1.0])
    assert grid.volume == 12
    assert grid.dim == 2


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_boundary_coordinates(grid):
    for axis in range(grid.num_axes):
        for upper in (False, True):
            coords = grid._boundary_coordinates(axis, upper)
            expected_shape = tuple(
                s for i, s in enumerate(grid.shape) if i != axis
            ) + (grid.num_axes,)
            assert coords.shape == expected_shape


def test_difference_vector_periodic():
    grid = pde.UnitGrid([8], periodic=True)
    diff = grid.difference_vector(np.array([0.5]), np.array([7.5]))
    np.testing.assert_allclose(diff, [-1.0])  # wraps around


def test_polar_spherical_volumes():
    polar = pde.PolarSymGrid(2, 16)
    assert polar.volume == pytest.approx(np.pi * 4, rel=1e-10)
    spherical = pde.SphericalSymGrid(2, 16)
    assert spherical.volume == pytest.approx(4 / 3 * np.pi * 8, rel=1e-10)
    cyl = pde.CylindricalSymGrid(1, (0, 2), (8, 8))
    assert cyl.volume == pytest.approx(2 * np.pi, rel=1e-10)


def test_volume_from_radius():
    from pde_tpu.grids.spherical import volume_from_radius

    assert volume_from_radius(2.0, 2) == pytest.approx(np.pi * 4)
    assert volume_from_radius(2.0, 3) == pytest.approx(4 / 3 * np.pi * 8)


@pytest.mark.parametrize(
    "grid",
    [pde.PolarSymGrid(2, 16), pde.SphericalSymGrid(2, 16)],
    ids=["polar", "spherical"],
)
@pytest.mark.parametrize("mode", ["valid", "full"])
def test_get_cartesian_grid(grid, mode):
    """Reference `/root/reference/pde/grids/spherical.py:358`."""
    cg = grid.get_cartesian_grid(mode)
    assert isinstance(cg, pde.CartesianGrid)
    assert cg.num_axes == grid.dim
    bound = cg.axes_bounds[0][1]
    if mode == "valid":
        assert bound == pytest.approx(2 / np.sqrt(grid.dim))
    else:
        assert bound == pytest.approx(2.0)
    with pytest.raises(ValueError):
        grid.get_cartesian_grid("nonsense")


def test_get_cartesian_grid_cylindrical():
    grid = pde.CylindricalSymGrid(2, (0, 4), (8, 16))
    cg = grid.get_cartesian_grid("full")
    assert cg.num_axes == 3
    assert cg.axes_bounds[2] == (0.0, 4.0)
    assert cg.axes_bounds[0][1] == pytest.approx(2.0)


def test_interpolate_to_cartesian_grid():
    """Cross-grid-class interpolation: radial field onto a Cartesian grid."""
    grid = pde.PolarSymGrid(2, 64)
    field = pde.ScalarField.from_expression(grid, "exp(-r**2)")
    cg = grid.get_cartesian_grid("valid", num=24)
    cart = field.interpolate_to_grid(cg)
    exact = pde.ScalarField.from_expression(cg, "exp(-(x**2 + y**2))")
    np.testing.assert_allclose(np.asarray(cart.data), np.asarray(exact.data),
                               atol=5e-3)


def test_interpolate_to_grid_rejects_vector_cross_class():
    grid = pde.PolarSymGrid(2, 8)
    vf = pde.VectorField(grid, data=np.zeros((2, 8)))
    with pytest.raises(NotImplementedError):
        vf.interpolate_to_grid(grid.get_cartesian_grid("valid", num=4))
