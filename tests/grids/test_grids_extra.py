"""Additional grid and BC tests mirroring reference edge cases."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.grids.base import DomainError
from pde_tpu.utils.config import config


def test_legacy_low_high_bc_format():
    grid = pde.UnitGrid([4])
    bcs = grid.get_boundary_conditions(
        {"low": {"value": 1}, "high": {"derivative": 2}}
    )
    assert bcs["x-"].value == 1.0
    assert bcs["x+"].value == 2.0


def test_legacy_list_bc_format():
    grid = pde.UnitGrid([4, 4])
    with pytest.warns(DeprecationWarning):
        bcs = grid.get_boundary_conditions(
            [{"value": 1}, {"derivative": 0}]
        )
    assert bcs[0].low.value == 1.0
    # 1d special case: two sides directly
    grid1 = pde.UnitGrid([4])
    with pytest.warns(DeprecationWarning):
        bcs1 = grid1.get_boundary_conditions([{"value": 1}, {"value": 2}])
    assert bcs1["x-"].value == 1.0
    assert bcs1["x+"].value == 2.0


def test_grid_transform_errors():
    grid = pde.UnitGrid([4, 4])
    with pytest.raises(ValueError):
        grid.transform([1, 1], "bogus", "grid")
    with pytest.raises(ValueError):
        grid.transform([1, 1], "grid", "bogus")
    # roundtrip grid -> cartesian -> grid
    p = np.array([1.5, 2.5])
    np.testing.assert_allclose(
        grid.transform(grid.transform(p, "grid", "cartesian"), "cartesian", "grid"),
        p,
    )


def test_contains_point():
    grid = pde.CartesianGrid([(0, 2), (0, 2)], 4)
    assert grid.contains_point([1, 1])
    assert not grid.contains_point([3, 1])
    result = grid.contains_point(np.array([[1.0, 1.0], [5.0, 1.0]]))
    np.testing.assert_array_equal(result, [True, False])


def test_difference_vector_nonperiodic():
    grid = pde.UnitGrid([8, 8])
    d = grid.difference_vector([1.0, 1.0], [7.0, 7.0])
    np.testing.assert_allclose(d, [6.0, 6.0])  # no wrapping
    assert grid.distance([0.0, 0.0], [3.0, 4.0]) == pytest.approx(5.0)


def test_spherical_random_points(rng):
    grid = pde.SphericalSymGrid(2, 16)
    for _ in range(5):
        p = grid.get_random_point(rng=rng, coords="grid")
        assert 0 <= p[0] <= 2
        cart = grid.get_random_point(rng=rng, coords="cartesian")
        assert cart.shape == (3,)
        assert np.linalg.norm(cart) <= 2 + 1e-12


def test_polar_point_transforms():
    grid = pde.PolarSymGrid(4, 16)
    # cartesian point (3, 0, ...) has radius 3
    r = grid.point_from_cartesian(np.array([[3.0, 0.0]]))
    np.testing.assert_allclose(r, [[3.0]])
    cart = grid.point_to_cartesian(np.array([[2.0]]))
    assert np.linalg.norm(cart) == pytest.approx(2.0)


def test_cylindrical_coords_symmetric():
    grid = pde.CylindricalSymGrid(2, (0, 4), (8, 8))
    p = grid.point_from_cartesian(np.array([[1.0, 0.0, 3.0]]))
    np.testing.assert_allclose(p, [[1.0, 3.0]])


def test_grid_boundary_coordinates():
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (4, 4))
    coords = grid._boundary_coordinates(axis=1, upper=True)
    assert coords.shape == (4, 2)
    np.testing.assert_allclose(coords[:, 1], 2.0)
    np.testing.assert_allclose(coords[:, 0], grid.axes_coords[0])


def test_accept_lists_config():
    grid = pde.UnitGrid([4])
    with config({"boundaries.accept_lists": False}):
        from pde_tpu.grids.boundaries.local import BCDataError

        with pytest.raises(BCDataError):
            grid.get_boundary_conditions([{"value": 1}, {"value": 2}])


def test_set_default_bc_helper():
    from pde_tpu.grids.boundaries import set_default_bc

    assert set_default_bc(None, "periodic") == "periodic"
    assert set_default_bc("derivative", "periodic") == "derivative"
    merged = set_default_bc({"x-": {"value": 1}}, "periodic")
    assert merged["*"] == "periodic"
    # single-condition dicts are not treated as per-side maps
    assert set_default_bc({"value": 2}, "periodic") == {"value": 2}


def test_registered_operators_listing():
    from pde_tpu.grids import registered_operators

    ops = registered_operators()
    assert "laplace" in ops["CartesianGrid"]
    assert "tensor_double_divergence" in ops["SphericalSymGrid"]
    assert "poisson_solver" in ops["CylindricalSymGrid"]


def test_grid_copy_and_typical_discretization():
    grid = pde.CartesianGrid([(0, 1), (0, 4)], (8, 8), periodic=True)
    clone = grid.copy()
    assert clone == grid and clone is not grid
    assert grid.typical_discretization == pytest.approx((0.125 + 0.5) / 2)
