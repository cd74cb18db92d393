"""Expression-PDE depth: vector variables, per-axis derivatives, Heaviside,
anti-periodic BCs — mirroring `tests/pdes/test_pde_class.py` behaviors."""

import numpy as np
import pytest

import pde_tpu as pde


def test_pde_vector_variable(rng):
    """PDE evolving a VectorField state."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    u = pde.VectorField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "vector_laplace(u)"})
    rate = eq.evolution_rate(u)
    assert isinstance(rate, pde.VectorField)
    np.testing.assert_allclose(
        rate.to_numpy(), u.laplace("auto_periodic_neumann").to_numpy(), atol=1e-12
    )
    result = eq.solve(u, t_range=0.1, dt=0.01, tracker=None)
    assert isinstance(result, pde.VectorField)
    assert np.all(np.isfinite(result.to_numpy()))


def test_pde_mixed_scalar_vector(rng):
    """Coupled system with a scalar and a vector variable (wave-like)."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    s = pde.ScalarField.random_uniform(grid, rng=rng)
    v = pde.VectorField.random_uniform(grid, rng=rng)
    state = pde.FieldCollection([s, v], labels=["s", "v"])
    eq = pde.PDE({"s": "divergence(v)", "v": "gradient(s)"})
    rate = eq.evolution_rate(state)
    assert isinstance(rate[0], pde.ScalarField)
    assert isinstance(rate[1], pde.VectorField)
    np.testing.assert_allclose(
        rate[0].to_numpy(),
        v.divergence("auto_periodic_neumann").to_numpy(),
        atol=1e-12,
    )
    result = eq.solve(state, t_range=0.1, dt=0.01, tracker=None)
    assert len(result) == 2


@pytest.mark.parametrize("spelling", ["Heaviside(x)", "heaviside(x, 0.5)"])
def test_pde_heaviside_rhs(spelling):
    """Heaviside is a pointwise function, not a differential operator."""
    grid = pde.CartesianGrid([[-1, 1]], [2])
    field = pde.ScalarField(grid, [-1.0, 1.0])
    eq = pde.PDE({"c": spelling})
    result = eq.solve(field, t_range=0.999, dt=0.1, tracker=None)
    np.testing.assert_allclose(result.to_numpy(), [-1.0, 2.0], rtol=1e-6)


def test_pde_product_of_axis_derivatives(rng):
    """Per-axis derivative operators d_dx/d_dy inside expressions."""
    grid = pde.CartesianGrid([[0, 2 * np.pi]] * 2, [32, 32], periodic=True)
    c = pde.ScalarField.from_expression(grid, "sin(x) * sin(y)")
    eq = pde.PDE({"c": "d_dx(c) * d_dy(c)"})
    rate = eq.evolution_rate(c)
    x, y = [np.asarray(a) for a in grid.coordinate_arrays]
    expected = np.cos(x) * np.sin(y) * np.sin(x) * np.cos(y)
    np.testing.assert_allclose(rate.to_numpy(), expected, atol=2e-2)


def test_axis_derivative_operators_directly():
    grid = pde.CartesianGrid([[0, 2 * np.pi]] * 2, [64, 64], periodic=True)
    c = pde.ScalarField.from_expression(grid, "sin(x)")
    x = np.asarray(grid.coordinate_arrays[0])

    d_dx = grid.make_operator("d_dx", bc="periodic")
    np.testing.assert_allclose(np.asarray(d_dx(c.data)), np.cos(x), atol=2e-3)

    d2_dx2 = grid.make_operator("d2_dx2", bc="periodic")
    np.testing.assert_allclose(np.asarray(d2_dx2(c.data)), -np.sin(x), atol=1e-3)

    # forward/backward one-sided stencils average to the central one
    fwd = np.asarray(grid.make_operator("d_dx_forward", bc="periodic")(c.data))
    bwd = np.asarray(grid.make_operator("d_dx_backward", bc="periodic")(c.data))
    np.testing.assert_allclose((fwd + bwd) / 2, np.asarray(d_dx(c.data)), atol=1e-12)

    # d_dy on a y-independent field vanishes
    d_dy = grid.make_operator("d_dy", bc="periodic")
    np.testing.assert_allclose(np.asarray(d_dy(c.data)), 0.0, atol=1e-12)

    with pytest.raises(NotImplementedError):
        grid.make_operator("d_dq", bc="periodic")


def test_axis_derivative_via_apply_operator(rng):
    field = pde.ScalarField.random_uniform(pde.UnitGrid([8, 8]), rng=rng)
    result = field.apply_operator("d_dy", bc={"derivative": 0})
    assert isinstance(result, pde.ScalarField)
    assert np.all(np.isfinite(result.to_numpy()))


def test_pde_anti_periodic_bc():
    """Anti-periodic BCs connect opposite edges with a sign flip."""
    grid = pde.CartesianGrid([[0, 2 * np.pi]], [64], periodic=True)
    # sin(x/2) is anti-periodic on [0, 2pi]
    field = pde.ScalarField.from_expression(grid, "sin(x/2)")
    lap = field.laplace("anti-periodic")
    np.testing.assert_allclose(lap.to_numpy(), -field.to_numpy() / 4, atol=1e-3)


def test_pde_explicit_time_dependence_flag():
    eq = pde.PDE({"c": "laplace(c) + sin(t)"})
    assert eq.explicit_time_dependence
    eq2 = pde.PDE({"c": "laplace(c)"})
    assert not eq2.explicit_time_dependence
