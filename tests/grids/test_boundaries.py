"""Tests for boundary conditions (mirrors reference tests/grids/boundaries/)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.grids.base import PeriodicityError
from pde_tpu.grids.boundaries.local import BCBase, BCDataError


def _ghost(grid, data, bc, t=0.0, args=None, rank=0):
    """Full data array with ghost cells for valid data."""
    bcs = grid.get_boundary_conditions(bc, rank=rank)
    full = jnp.pad(jnp.asarray(data), [(0, 0)] * rank + [(1, 1)] * grid.num_axes)
    return np.asarray(bcs.make_ghost_setter()(full, t, args))


def test_dirichlet_virtual_point():
    grid = pde.UnitGrid([4])
    data = np.array([1.0, 2.0, 3.0, 4.0])
    full = _ghost(grid, data, {"value": 5})
    # ghost = 2*value - edge
    assert full[0] == pytest.approx(2 * 5 - 1.0)
    assert full[-1] == pytest.approx(2 * 5 - 4.0)


def test_neumann_virtual_point():
    grid = pde.UnitGrid([4])
    data = np.array([1.0, 2.0, 3.0, 4.0])
    full = _ghost(grid, data, {"derivative": 2})
    assert full[0] == pytest.approx(1.0 + 2 * 1.0)  # dx=1, outward normal
    assert full[-1] == pytest.approx(4.0 + 2 * 1.0)


def test_mixed_virtual_point():
    grid = pde.UnitGrid([4])
    data = np.array([1.0, 2.0, 3.0, 4.0])
    gamma, beta = 2.0, 7.0
    full = _ghost(grid, data, {"type": "mixed", "value": gamma, "const": beta})
    dx = 1.0
    factor = (2 - dx * gamma) / (2 + dx * gamma)
    const = 2 * dx * beta / (2 + dx * gamma)
    assert full[0] == pytest.approx(const + factor * 1.0)
    assert full[-1] == pytest.approx(const + factor * 4.0)


def test_curvature_virtual_point():
    grid = pde.UnitGrid([4])
    data = np.array([1.0, 2.0, 3.0, 4.0])
    full = _ghost(grid, data, {"curvature": 3})
    assert full[0] == pytest.approx(3.0 + 2 * 1.0 - 2.0)
    assert full[-1] == pytest.approx(3.0 + 2 * 4.0 - 3.0)


def test_periodic_and_antiperiodic():
    grid = pde.UnitGrid([4], periodic=True)
    data = np.array([1.0, 2.0, 3.0, 4.0])
    full = _ghost(grid, data, "periodic")
    assert full[0] == 4.0 and full[-1] == 1.0
    full = _ghost(grid, data, "anti-periodic")
    assert full[0] == -4.0 and full[-1] == -1.0
    with pytest.raises(PeriodicityError):
        _ghost(pde.UnitGrid([4]), data, "periodic")


def test_bc_expressions_space():
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (4, 4))
    data = np.zeros((4, 4))
    full = _ghost(grid, data, {"x": {"value": "y**2"}, "y": {"value": 0}})
    ys = grid.axes_coords[1]
    np.testing.assert_allclose(full[0, 1:-1], 2 * ys**2, rtol=1e-12)


def test_bc_expressions_time():
    grid = pde.UnitGrid([4])
    data = np.zeros(4)
    full = _ghost(grid, data, {"value_expression": "t**2"}, t=3.0)
    assert full[0] == pytest.approx(2 * 9.0)


def test_user_bc():
    grid = pde.UnitGrid([4])
    data = np.array([1.0, 2.0, 3.0, 4.0])
    full = _ghost(grid, data, "user", args={"value": 5})
    assert full[0] == pytest.approx(2 * 5 - 1.0)
    full = _ghost(grid, data, "user", args={"virtual_point": 9.0})
    assert full[0] == pytest.approx(9.0)
    full = _ghost(grid, data, "user")  # no args: no-op
    assert full[0] == 0.0


def test_bc_mini_language():
    grid = pde.UnitGrid([4, 4], periodic=[True, False])
    bcs = grid.get_boundary_conditions(
        {"x": "periodic", "y-": {"value": 2}, "y+": {"derivative": -1}}
    )
    assert bcs[0].periodic
    assert not bcs[1].periodic
    assert bcs["y-"].value == 2.0
    assert bcs["bottom"].value == 2.0
    # wildcard
    bcs2 = grid.get_boundary_conditions({"x": "periodic", "*": {"value": 1}})
    assert bcs2["y+"].value == 1.0
    # single condition dict applies everywhere
    grid2 = pde.UnitGrid([4, 4])
    bcs3 = grid2.get_boundary_conditions({"value": 2})
    assert all(b.value == 2.0 for b in bcs3.boundaries)


def test_auto_periodic_neumann():
    grid = pde.UnitGrid([4, 4], periodic=[True, False])
    bcs = grid.get_boundary_conditions("auto_periodic_neumann")
    assert bcs[0].periodic
    assert not bcs[1].periodic
    assert bcs["y-"].value == 0


def test_boundaries_setter_callable():
    grid = pde.UnitGrid([4], periodic=False)

    def setter(full, args=None):
        return full.at[0].set(7.0).at[-1].set(8.0)

    bcs = grid.get_boundary_conditions(setter)
    full = bcs.make_ghost_setter()(jnp.pad(jnp.arange(4.0), (1, 1)))
    assert float(full[0]) == 7.0 and float(full[-1]) == 8.0


def test_bc_registry():
    names = pde.registered_boundary_condition_names()
    for key in ["value", "derivative", "mixed", "curvature", "value_expression"]:
        assert key in names
    with pytest.raises(BCDataError):
        BCBase.from_str(pde.UnitGrid([4]), 0, False, "unknown_bc")


def test_bc_equality_and_hash():
    grid = pde.UnitGrid([4, 4])
    bc1 = grid.get_boundary_conditions({"value": 2})
    bc2 = grid.get_boundary_conditions({"value": 2})
    bc3 = grid.get_boundary_conditions({"value": 3})
    assert bc1 == bc2
    assert hash(bc1) == hash(bc2)
    assert bc1 != bc3


def test_normal_bcs_vector_field():
    grid = pde.UnitGrid([3, 3])
    data = np.ones((2, 3, 3))
    full = _ghost(grid, data, {"normal_value": 5.0}, rank=1)
    # normal component (component 0 on axis 0) must satisfy Dirichlet
    assert full[0, 0, 2] == pytest.approx(2 * 5 - 1.0)
    # tangential component untouched (stays padded zero)
    assert full[1, 0, 2] == 0.0


def test_mathematical_representation():
    grid = pde.UnitGrid([4])
    bcs = grid.get_boundary_conditions({"x-": {"value": 2}, "x+": {"derivative": 1}})
    rep = bcs.get_mathematical_representation("c")
    assert "c = 2.0" in rep
    assert "∂c/∂x = 1.0" in rep
