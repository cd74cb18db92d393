"""Tests for the expression-PDE compiler (mirrors reference tests/pdes/test_pde_class.py)."""

import numpy as np
import pytest
import sympy

import pde_tpu as pde


@pytest.fixture
def grid():
    return pde.UnitGrid([16, 16], periodic=True)


def test_pde_matches_predefined(grid, rng):
    state = pde.ScalarField.random_uniform(grid, -0.2, 0.2, rng=rng)
    pairs = [
        (pde.PDE({"c": "laplace(c**3 - c - laplace(c))"}), pde.CahnHilliardPDE()),
        (pde.PDE({"c": "0.5 * laplace(c)"}), pde.DiffusionPDE(diffusivity=0.5)),
        (
            pde.PDE({"c": "laplace(c) - c**3 + c"}),
            pde.AllenCahnPDE(interface_width=1),
        ),
    ]
    for expr_eq, ref_eq in pairs:
        rate_expr = expr_eq.evolution_rate(state)
        rate_ref = ref_eq.evolution_rate(state)
        np.testing.assert_allclose(
            np.asarray(rate_expr.data), np.asarray(rate_ref.data), atol=1e-12
        )


def test_pde_unicode_shorthands(grid, rng):
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq1 = pde.PDE({"c": "∇²c + c²"})
    eq2 = pde.PDE({"c": "laplace(c) + c**2"})
    np.testing.assert_allclose(
        np.asarray(eq1.evolution_rate(state).data),
        np.asarray(eq2.evolution_rate(state).data),
    )
    eq3 = pde.PDE({"c": "|∇c|²"})
    eq4 = pde.PDE({"c": "gradient_squared(c)"})
    np.testing.assert_allclose(
        np.asarray(eq3.evolution_rate(state).data),
        np.asarray(eq4.evolution_rate(state).data),
    )


def test_pde_coupled_system(grid, rng):
    eq = pde.PDE({"u": "laplace(u) - v", "v": "u - v"})
    state = pde.FieldCollection.scalar_random_uniform(
        2, grid, labels=["u", "v"], rng=rng
    )
    eq.check_rhs_consistency(state)
    result = eq.solve(state, t_range=0.5, dt=0.01, tracker=None)
    assert isinstance(result, pde.FieldCollection)
    assert np.all(np.isfinite(np.asarray(result[0].data)))


def test_pde_bc_routing():
    grid = pde.CartesianGrid([(0, 1)], 16)
    eq = pde.PDE(
        {"c": "laplace(c)"},
        bc_ops={"c:laplace": {"x-": {"value": 0}, "x+": {"value": 1}}},
    )
    state = pde.ScalarField(grid, 0.0)
    result = eq.solve(state, t_range=3, dt=1e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(result.data), grid.axes_coords[0], atol=1e-3
    )
    # unknown operators in bc are tolerated; missing BC raises at compile
    eq_bad = pde.PDE({"c": "laplace(c)"}, bc_ops={"q:laplace": "periodic"})
    assert "q:laplace" in eq_bad.bcs


def test_pde_time_space_dependence():
    grid = pde.CartesianGrid([(0, 2 * np.pi)], 32, periodic=True)
    state = pde.ScalarField(grid, 0.0)
    eq = pde.PDE({"c": "sin(x) * exp(-t) - 0*c"})
    assert eq.explicit_time_dependence
    result = eq.solve(state, t_range=20, dt=0.01, tracker=None)
    # integral of source: sin(x) * (1 - e^-t) -> sin(x) as t->inf
    np.testing.assert_allclose(
        np.asarray(result.data), np.sin(grid.axes_coords[0]), atol=1e-2
    )


def test_pde_consts_and_user_funcs(grid, rng):
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"c": "a * double(c)"}, consts={"a": 3.0},
                 user_funcs={"double": lambda x: 2 * x})
    rate = eq.evolution_rate(state)
    np.testing.assert_allclose(np.asarray(rate.data), 6 * np.asarray(state.data))
    # field-valued constant
    mask = pde.ScalarField.from_expression(
        pde.CartesianGrid([(0, 16), (0, 16)], (16, 16), periodic=True), "x"
    )
    mask = pde.ScalarField(grid, mask.data)
    eq2 = pde.PDE({"c": "k * c"}, consts={"k": mask})
    rate2 = eq2.evolution_rate(state)
    np.testing.assert_allclose(
        np.asarray(rate2.data), np.asarray(mask.data) * np.asarray(state.data)
    )


def test_pde_noise_per_field(grid):
    eq = pde.PDE({"u": "0", "v": "0"}, noise={"u": 1.0, "v": 0.0})
    state = pde.FieldCollection(
        [pde.ScalarField(grid, 0.0, label="u"), pde.ScalarField(grid, 0.0, label="v")]
    )
    assert eq.is_sde
    result = eq.solve(state, t_range=0.5, dt=0.01, tracker=None)
    assert float(result[0].fluctuations) > 0.1
    np.testing.assert_allclose(np.asarray(result[1].data), 0.0)


def test_pde_special_operators(grid, rng):
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"c": "dot(gradient(c), gradient(c))"})
    rate = eq.evolution_rate(state)
    expected = state.gradient("auto_periodic_neumann").to_scalar("squared_sum")
    np.testing.assert_allclose(
        np.asarray(rate.data), np.asarray(expected.data), atol=1e-12
    )
    # gradient_squared and dot(gradient, gradient) agree for central=False? they
    # differ in stencil; just check integral() lowering
    eq2 = pde.PDE({"c": "c - integral(c) / 256"})
    rate2 = eq2.evolution_rate(state)
    np.testing.assert_allclose(
        float(rate2.average), 0.0, atol=1e-12
    )


def test_pde_jacobian_spectral():
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
    jac = eq._jacobian_spectral({"c": 0.0})
    q = sympy.Symbol("q")
    assert sympy.simplify(jac[0, 0] - (q**2 - q**4)) == 0
    qs, evs = eq._dispersion_relation({"c": 0.0}, qs=np.array([0.5, 1.0, 2.0]))
    np.testing.assert_allclose(evs[:, 0].real, [0.1875, 0.0, -12.0])
    # non-stationary state is rejected
    eq2 = pde.PDE({"c": "c - laplace(c)"})
    with pytest.raises(RuntimeError):
        eq2._jacobian_spectral({"c": 1.0})


def test_pde_invalid_input():
    with pytest.raises(ValueError):
        pde.PDE({"t": "laplace(t)"})
    with pytest.raises(ValueError):
        pde.PDE({"1bad": "0"})
    with pytest.raises(ValueError):
        pde.PDE({"class": "0"})
    eq = pde.PDE({"u": "laplace(u)", "v": "0"})
    grid = pde.UnitGrid([4])
    with pytest.raises(ValueError):
        eq.evolution_rate(pde.ScalarField(grid))  # needs 2 fields


def test_evaluate(rng):
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 32, periodic=True)
    a = pde.ScalarField.from_expression(grid, "sin(x)")
    b = pde.ScalarField.from_expression(grid, "cos(y)")
    res = pde.evaluate("a * b", {"a": a, "b": b})
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(a.data) * np.asarray(b.data)
    )
    lap = pde.evaluate("laplace(a)", {"a": a})
    np.testing.assert_allclose(np.asarray(lap.data), -np.asarray(a.data), atol=5e-3)
    grad = pde.evaluate("gradient(a)", {"a": a})
    assert isinstance(grad, pde.VectorField)
    # expression with coordinates
    res2 = pde.evaluate("a * sin(x)", {"a": a})
    np.testing.assert_allclose(np.asarray(res2.data), np.asarray(a.data) ** 2, atol=1e-12)


def test_field_apply_expression(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    result = field.apply("c**2")
    np.testing.assert_allclose(np.asarray(result.data), np.asarray(field.data) ** 2)
