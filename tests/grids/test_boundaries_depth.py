"""Boundary-condition depth tests mirroring the reference's
`tests/grids/boundaries/test_{local,axes}_boundaries.py` behaviors."""

import numpy as np
import pytest

import pde_tpu as pde


def test_inhomogeneous_value_array_1d():
    """Array-valued Dirichlet: ghost cells mirror around the per-point value."""
    grid = pde.CartesianGrid([[0, 1]], [4])
    field = pde.ScalarField(grid, 1.0)
    full = field.get_full_data({"x-": {"value": 3.0}, "x+": {"derivative": 0}})
    arr = np.asarray(full)
    # ghost + edge average equals the boundary value
    np.testing.assert_allclose((arr[0] + arr[1]) / 2, 3.0)
    np.testing.assert_allclose(arr[-1], arr[-2])


def test_inhomogeneous_value_array_2d():
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 0.0)
    values = np.linspace(1.0, 2.0, 4)
    full = field.get_full_data(
        {"x-": {"value": values}, "x+": {"value": 0}, "y": {"derivative": 0}}
    )
    arr = np.asarray(full)
    np.testing.assert_allclose((arr[0, 1:-1] + arr[1, 1:-1]) / 2, values)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_expression_bc_value_operator(dim):
    """laplace(linear field) = 0 when expression BCs extend it linearly."""
    size = 8
    grid = pde.UnitGrid([size] * dim)
    expr = "x"
    field = pde.ScalarField.from_expression(grid, expr)
    bc = {"x": {"value_expression": "x"}}
    for ax in "yz"[: dim - 1]:
        bc[ax] = {"derivative": 0}
    lap = field.laplace(bc)
    np.testing.assert_allclose(lap.to_numpy(), 0.0, atol=1e-10)


@pytest.mark.parametrize("dim", [1, 2])
def test_expression_bc_derivative_operator(dim):
    """Neumann expression BC with the exact slope keeps a linear field linear.

    Derivatives are specified along the OUTWARD normal, so the lower side
    needs the negated slope.
    """
    grid = pde.UnitGrid([8] * dim)
    field = pde.ScalarField.from_expression(grid, "2*x")
    bc = {
        "x-": {"derivative_expression": "-2"},
        "x+": {"derivative_expression": "2"},
    }
    if dim > 1:
        bc["y"] = {"derivative": 0}
    lap = field.laplace(bc)
    np.testing.assert_allclose(lap.to_numpy(), 0.0, atol=1e-10)


def test_expression_bc_mixed():
    """Robin BC a*c + dc/dn = b expressed via mixed_expression."""
    grid = pde.CartesianGrid([[0, 1]], [16])
    field = pde.ScalarField(grid, 1.0)
    result_expr = field.laplace(
        {
            "x-": {"mixed_expression": {"value": "2", "const": "2"}}
            if False
            else {"type": "mixed", "value": 2.0, "const": 2.0},
            "x+": {"derivative": 0},
        }
    )
    # at equilibrium value c=1: a*c = 2 = const -> zero flux -> zero laplacian
    np.testing.assert_allclose(result_expr.to_numpy(), 0.0, atol=1e-10)


def test_expression_bc_user_function():
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 0.0)
    full = field.get_full_data(
        {
            "x": {"value_expression": "f(y)", "user_funcs": {"f": lambda y: y**2}},
            "y": {"derivative": 0},
        }
    )
    arr = np.asarray(full)
    y = np.asarray(grid.coordinate_arrays[1])[0]
    np.testing.assert_allclose((arr[0, 1:-1] + arr[1, 1:-1]) / 2, y**2, atol=1e-10)


def test_bc_specification_equivalences():
    """Different spellings of the same condition give identical ghosts."""
    grid = pde.UnitGrid([6])
    field = pde.ScalarField(grid, 2.0)
    specs = [
        {"x": {"value": 0}},
        {"x": "dirichlet"},
        {"x-": {"value": 0}, "x+": {"value": 0}},
    ]
    results = [np.asarray(field.get_full_data(s)) for s in specs]
    for r in results[1:]:
        np.testing.assert_array_equal(results[0], r)

    specs = [{"x": {"derivative": 0}}, {"x": "neumann"}, {"x": "no-flux"}]
    results = [np.asarray(field.get_full_data(s)) for s in specs]
    for r in results[1:]:
        np.testing.assert_array_equal(results[0], r)


def test_bc_invalid_specifications(caplog):
    import logging

    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 1.0)
    with pytest.raises(Exception):
        field.laplace({"x": "nonsense-condition", "y": {"derivative": 0}})
    # unknown keys are warned about (matching the reference's behavior)
    with caplog.at_level(logging.WARNING):
        field.laplace({"q": {"value": 0}, "x": {"value": 0}, "y": {"value": 0}})
    assert any("q" in rec.getMessage() for rec in caplog.records)
    # periodic BC on a non-periodic axis is rejected
    with pytest.raises(Exception):
        field.laplace({"x": "periodic", "y": {"derivative": 0}})


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_set_ghost_cells_dim_periodic(dim, periodic, rng):
    grid = pde.UnitGrid([4] * dim, periodic=periodic)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    bc = "periodic" if periodic else {"derivative": 0}
    full = np.asarray(field.get_full_data(bc))
    assert full.shape == tuple(4 + 2 for _ in range(dim))
    data = field.to_numpy()
    # check ghost planes along the first axis
    inner = (slice(1, -1),) * (dim - 1)
    if periodic:
        np.testing.assert_array_equal(full[(0, *inner)], data[-1])
        np.testing.assert_array_equal(full[(-1, *inner)], data[0])
    else:
        np.testing.assert_array_equal(full[(0, *inner)], data[0])
        np.testing.assert_array_equal(full[(-1, *inner)], data[-1])


def test_boundaries_container_protocol():
    grid = pde.UnitGrid([4, 4])
    bcs = grid.get_boundary_conditions({"x": {"value": 1}, "y": {"derivative": 2}})
    pairs = list(bcs)
    assert len(pairs) == 2
    # equality and hashing are structural
    bcs2 = grid.get_boundary_conditions({"x": {"value": 1}, "y": {"derivative": 2}})
    assert bcs == bcs2
    bcs3 = grid.get_boundary_conditions({"x": {"value": 2}, "y": {"derivative": 2}})
    assert bcs != bcs3


def test_mixed_condition_limits(rng):
    """Robin with huge `value` approaches Dirichlet(const/value); with 0 it is Neumann."""
    grid = pde.CartesianGrid([[0, 1]], [8])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    big = 1e8
    robin_dirichlet = np.asarray(
        field.get_full_data(
            {"x-": {"type": "mixed", "value": big, "const": 3.0 * big},
             "x+": {"derivative": 0}}
        )
    )
    dirichlet = np.asarray(
        field.get_full_data({"x-": {"value": 3.0}, "x+": {"derivative": 0}})
    )
    np.testing.assert_allclose(robin_dirichlet[0], dirichlet[0], rtol=1e-5)

    # with value=0 the condition is dc/dn = const along the OUTWARD normal
    robin_neumann = np.asarray(
        field.get_full_data(
            {"x-": {"type": "mixed", "value": 0.0, "const": 1.5},
             "x+": {"derivative": 0}}
        )
    )
    neumann = np.asarray(
        field.get_full_data({"x-": {"derivative": 1.5}, "x+": {"derivative": 0}})
    )
    np.testing.assert_allclose(robin_neumann[0], neumann[0], rtol=1e-12)


def test_boundary_side_synonyms():
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 1.0)
    named = np.asarray(
        field.get_full_data(
            {"left": {"value": 1}, "right": {"value": 0},
             "bottom": {"derivative": 0}, "top": {"derivative": 0}}
        )
    )
    plusminus = np.asarray(
        field.get_full_data(
            {"x-": {"value": 1}, "x+": {"value": 0},
             "y-": {"derivative": 0}, "y+": {"derivative": 0}}
        )
    )
    np.testing.assert_array_equal(named, plusminus)


def test_normal_bcs_on_vector_field(rng):
    """normal_* conditions apply to the normal component of rank-1 fields."""
    grid = pde.UnitGrid([6, 6])
    v = pde.VectorField.random_uniform(grid, rng=rng)
    div = v.divergence({"normal_value": 0})
    assert np.all(np.isfinite(div.to_numpy()))
    div2 = v.divergence({"normal_derivative": 0})
    assert np.all(np.isfinite(div2.to_numpy()))
    assert not np.allclose(div.to_numpy(), div2.to_numpy())


def test_curvature_bc_quadratic_field():
    """curvature BC continues a parabola exactly."""
    grid = pde.CartesianGrid([[0, 1]], [16])
    field = pde.ScalarField.from_expression(grid, "x**2")
    lap = field.laplace({"x": {"curvature": 2.0}})
    np.testing.assert_allclose(lap.to_numpy(), 2.0, atol=1e-8)


def test_time_dependent_bc_in_solve():
    """Expression BCs see the simulation time `t`."""
    grid = pde.CartesianGrid([[0, 1]], [8])
    field = pde.ScalarField(grid, 0.0)
    eq = pde.DiffusionPDE(diffusivity=1.0, bc={"x-": {"value_expression": "t"},
                                               "x+": {"derivative": 0}})
    result = eq.solve(field, t_range=1.0, dt=1e-3, tracker=None)
    # the boundary has been driven up towards t=1 values: field grew
    assert float(result.average) > 0.05
    assert float(result.to_numpy()[0]) > float(result.to_numpy()[-1])
