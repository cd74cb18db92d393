"""Systematic sweep over boundary-condition classes, grids, and field ranks.

Ports the reference's BC coverage (12 condition classes,
`/root/reference/pde/grids/boundaries/local.py:148-2150`): each condition's
virtual point must satisfy its defining relation on every grid class.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.grids.boundaries.local import BCBase


def _grids():
    return [
        pde.CartesianGrid([(0, 2)], 8),
        pde.CartesianGrid([(0, 2), (0, 1)], (6, 4)),
        pde.PolarSymGrid(3, 8),
        pde.SphericalSymGrid(3, 8),
        pde.CylindricalSymGrid(2, (0, 3), (4, 6)),
    ]


GRID_IDS = ["cartesian1d", "cartesian2d", "polar", "spherical", "cylindrical"]

BC_SPECS = [
    ("dirichlet", {"value": 1.5}),
    ("neumann", {"derivative": 0.5}),
    ("mixed", {"type": "mixed", "value": 2.0, "const": 1.0}),
    ("curvature", {"curvature": 0.75}),
    ("normal_value", {"normal_value": 1.5}),
    ("normal_derivative", {"normal_derivative": 0.5}),
]


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
@pytest.mark.parametrize("name,spec", BC_SPECS, ids=[n for n, _ in BC_SPECS])
@pytest.mark.parametrize("upper", [False, True], ids=["low", "high"])
def test_virtual_point_relation(grid, name, spec, upper, rng):
    """The ghost value satisfies the BC's defining relation."""
    axis = grid.num_axes - 1  # the last axis is never periodic here
    rank = 1 if name.startswith("normal") else 0
    bc = BCBase.from_data(grid, axis, upper, spec, rank=rank)
    dx = grid.discretization[axis]

    shape = (grid.dim,) * rank + tuple(grid.shape)
    data = rng.random(shape)
    idx = (1,) * (grid.num_axes - 1)  # probe one interior boundary point
    ghost = np.asarray(bc.get_virtual_point(data, idx=idx))

    sel = [slice(None)] * rank + list(idx)
    sel.insert(rank + axis, -1 if upper else 0)
    edge = data[tuple(sel)]
    sel[rank + axis] = -2 if upper else 1
    second = data[tuple(sel)]

    if rank == 1:
        # normal BCs constrain only the component normal to the boundary
        # (the ghost setter writes component index == axis)
        ghost = np.atleast_1d(ghost)[axis if grid.dim > 1 else 0]
        edge = np.atleast_1d(edge)[axis if grid.dim > 1 else 0]
        second = np.atleast_1d(second)[axis if grid.dim > 1 else 0]
    value = spec.get("value", spec.get("derivative", spec.get("curvature",
            spec.get("normal_value", spec.get("normal_derivative")))))
    if name in ("dirichlet", "normal_value"):
        np.testing.assert_allclose((ghost + edge) / 2, value, rtol=1e-12)
    elif name in ("neumann", "normal_derivative"):
        # outward derivative: the ghost always lies outward of the edge
        np.testing.assert_allclose((ghost - edge) / dx, value,
                                   rtol=1e-10, atol=1e-12)
    elif name == "mixed":
        # ∂_n c + γ c = β with c, ∂_n c evaluated at the boundary midpoint
        gamma, beta = spec["value"], spec["const"]
        bnd_val = (ghost + edge) / 2
        bnd_deriv = (ghost - edge) / dx
        np.testing.assert_allclose(bnd_deriv + gamma * bnd_val, beta,
                                   rtol=1e-10, atol=1e-12)
    elif name == "curvature":
        np.testing.assert_allclose((ghost - 2 * edge + second) / dx**2,
                                   value, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_periodic_bc_roundtrip(grid, rng):
    """Periodic pairs copy the opposite edge (where the grid allows it)."""
    if not any(grid.periodic):
        # make a periodic variant for Cartesian grids only
        if not isinstance(grid, pde.CartesianGrid):
            pytest.skip("grid cannot be periodic")
        grid = pde.CartesianGrid(grid.axes_bounds, grid.shape, periodic=True)
    axis = int(np.argmax(grid.periodic))
    bcs = grid.get_boundary_conditions("auto_periodic_neumann")
    data = rng.random(grid.shape)
    full = np.asarray(bcs.make_ghost_setter()(jnp.pad(jnp.asarray(data), 1)))
    sel_ghost = [slice(1, -1)] * grid.num_axes
    sel_src = [slice(1, -1)] * grid.num_axes
    sel_ghost[axis] = 0
    sel_src[axis] = -2
    np.testing.assert_allclose(full[tuple(sel_ghost)], full[tuple(sel_src)])


@pytest.mark.parametrize(
    "spec,cls_name",
    [
        ({"value": 1}, "DirichletBC"),
        ({"derivative": 1}, "NeumannBC"),
        ({"type": "mixed", "value": 1}, "MixedBC"),
        ({"curvature": 1}, "CurvatureBC"),
        ({"value_expression": "x"}, "ExpressionValueBC"),
        ({"derivative_expression": "x"}, "ExpressionDerivativeBC"),
        ({"normal_value": 1}, "NormalDirichletBC"),
        ({"normal_derivative": 1}, "NormalNeumannBC"),
        ({"normal_curvature": 1}, "NormalCurvatureBC"),
        ({"type": "normal_mixed", "value": 1}, "NormalMixedBC"),
    ],
)
def test_bc_class_dispatch(spec, cls_name):
    """The mini-language maps specifications to the documented classes."""
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (4, 4))
    rank = 1 if cls_name.startswith("Normal") else 0
    bc = BCBase.from_data(grid, 0, True, spec, rank=rank)
    assert type(bc).__name__ == cls_name
    assert isinstance(bc.get_mathematical_representation("f"), str)
    assert bc == bc.copy()


@pytest.mark.parametrize("rank", [0, 1, 2])
def test_ghost_setter_rank_agnostic(rank, rng):
    """Ghost setters handle data of any tensorial rank (reference
    `local.py:1613` rank-agnostic offsets)."""
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (5, 4))
    bcs = grid.get_boundary_conditions({"derivative": 0})
    shape = (2,) * rank + tuple(grid.shape)
    data = rng.random(shape)
    full = jnp.pad(jnp.asarray(data), [(0, 0)] * rank + [(1, 1)] * 2)
    out = np.asarray(bcs.make_ghost_setter()(full))
    # zero-flux: ghost equals edge
    np.testing.assert_allclose(out[..., 0, 1:-1], out[..., 1, 1:-1])
    np.testing.assert_allclose(out[..., -1, 1:-1], out[..., -2, 1:-1])


def test_user_bc_roundtrip(rng):
    """UserBC reads ghost values from args (reference `local.py:665`)."""
    grid = pde.CartesianGrid([(0, 1)], 6)
    bcs = grid.get_boundary_conditions("user")
    data = jnp.asarray(rng.random(6))
    setter = bcs.make_ghost_setter()
    out = np.asarray(setter(jnp.pad(data, 1), args={"virtual_point": 7.5}))
    assert out[0] == pytest.approx(7.5)
    assert out[-1] == pytest.approx(7.5)
    out = np.asarray(setter(jnp.pad(data, 1), args={"value": 2.0}))
    assert (out[0] + out[1]) / 2 == pytest.approx(2.0)


@pytest.mark.parametrize("grid", _grids(), ids=GRID_IDS)
def test_bc_sparse_matrix_data(grid):
    """Sparse-matrix data matches the virtual-point formula (used by the
    Poisson solver; reference `local.py` get_sparse_matrix_data)."""
    axis = grid.num_axes - 1
    bc = BCBase.from_data(grid, axis, True, {"value": 2.0}, rank=0)
    idx = tuple(s - 1 for s in grid.shape)
    const, factors = bc.get_sparse_matrix_data(idx)
    probe_idx = tuple(s - 1 for i, s in enumerate(grid.shape) if i != axis)
    data = np.zeros(grid.shape)
    probe = np.ones(grid.shape)
    base = float(np.asarray(bc.get_virtual_point(data, idx=probe_idx)))
    lifted = float(np.asarray(bc.get_virtual_point(probe, idx=probe_idx)))
    np.testing.assert_allclose(base, const, rtol=1e-12)
    np.testing.assert_allclose(lifted - base, sum(factors.values()), rtol=1e-12)
