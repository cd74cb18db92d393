"""Tests for grids (mirrors reference tests/grids/test_cartesian_grids.py)."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.grids.base import GridBase, discretize_interval


def test_discretize_interval():
    xs, dx = discretize_interval(0, 1, 4)
    assert dx == 0.25
    np.testing.assert_allclose(xs, [0.125, 0.375, 0.625, 0.875])


def test_unit_grid():
    grid = pde.UnitGrid([4, 6], periodic=[True, False])
    assert grid.shape == (4, 6)
    assert grid.dim == 2
    assert grid.num_axes == 2
    assert grid.periodic == [True, False]
    np.testing.assert_allclose(grid.discretization, [1.0, 1.0])
    assert grid.volume == 24
    assert grid.num_cells == 24
    np.testing.assert_allclose(grid.axes_coords[0], [0.5, 1.5, 2.5, 3.5])


def test_cartesian_grid():
    grid = pde.CartesianGrid([(0, 2), (1, 4)], (4, 6))
    assert grid.axes_bounds == ((0.0, 2.0), (1.0, 4.0))
    np.testing.assert_allclose(grid.discretization, [0.5, 0.5])
    assert grid.volume == pytest.approx(6.0)
    # single int shape broadcast
    g2 = pde.CartesianGrid([(0, 1), (0, 1)], 8)
    assert g2.shape == (8, 8)
    with pytest.raises(ValueError):
        pde.CartesianGrid([(0, 1)], [2, 3])  # incompatible dims raise


def test_grid_serialization():
    for grid in [
        pde.UnitGrid([4, 5], periodic=[False, True]),
        pde.CartesianGrid([(0, 2), (-1, 1)], (4, 6), periodic=True),
    ]:
        restored = GridBase.from_state(grid.state_serialized)
        assert restored == grid
        assert restored.__class__ is grid.__class__


def test_grid_equality_and_hash():
    g1 = pde.UnitGrid([4, 4])
    g2 = pde.UnitGrid([4, 4])
    g3 = pde.UnitGrid([4, 5])
    assert g1 == g2
    assert hash(g1) == hash(g2)
    assert g1 != g3


def test_grid_axis_helpers():
    grid = pde.CartesianGrid([(0, 1)] * 3, 4)
    assert grid.get_axis_index("x") == 0
    assert grid.get_axis_index("z") == 2
    assert grid._get_boundary_index("left") == (0, False)
    assert grid._get_boundary_index("top") == (1, True)
    assert grid._get_boundary_index("y-") == (1, False)
    with pytest.raises(ValueError):
        grid.get_axis_index("w")


def test_grid_integrate():
    grid = pde.CartesianGrid([(0, 2), (0, 3)], (10, 15))
    data = np.ones(grid.shape)
    assert float(grid.integrate(data)) == pytest.approx(6.0)
    partial = grid.integrate(data, axes=1)
    assert partial.shape == (10,)
    np.testing.assert_allclose(np.asarray(partial), 3.0)


def test_grid_point_handling():
    grid = pde.UnitGrid([4, 4], periodic=True)
    p = grid.normalize_point(np.array([5.0, -1.0]))
    np.testing.assert_allclose(p, [1.0, 3.0])
    d = grid.difference_vector([0.5, 0.5], [3.5, 3.5])
    np.testing.assert_allclose(d, [-1.0, -1.0])
    mirrors = list(grid.iter_mirror_points(np.array([1.0, 1.0])))
    assert len(mirrors) == 4
    # transforms
    cell = grid.transform(np.array([0.5, 1.5]), "grid", "cell")
    np.testing.assert_allclose(cell, [0.5, 1.5])


def test_grid_slice():
    grid = pde.CartesianGrid([(0, 2), (0, 4)], (4, 8), periodic=[True, False])
    sub = grid.slice([1])
    assert sub.shape == (8,)
    assert sub.axes_bounds == ((0.0, 4.0),)
    assert sub.periodic == [False]


def test_random_point(rng):
    grid = pde.CartesianGrid([(0, 2), (0, 2)], 8)
    for _ in range(10):
        p = grid.get_random_point(rng=rng, coords="grid")
        assert np.all(p >= 0) and np.all(p <= 2)
