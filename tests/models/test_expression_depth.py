"""Expression-PDE compiler depth: shorthands, routing, dtypes, operators.

Extends `tests/models/test_expression_pde.py` toward the reference's
`tests/pdes/test_pde_class.py` coverage.
"""

import numpy as np
import pytest

import pde_tpu as pde


def test_unicode_shorthand_variants(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    variants = [
        pde.PDE({"c": "∇²(c³ - c)"}),
        pde.PDE({"c": "laplace(c**3 - c)"}),
    ]
    rates = [np.asarray(eq.evolution_rate(state).data) for eq in variants]
    np.testing.assert_allclose(rates[0], rates[1], rtol=1e-12)


def test_gradient_squared_shorthand(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    a = pde.PDE({"c": "|∇c|²"}).evolution_rate(state)
    b = pde.PDE({"c": "gradient_squared(c)"}).evolution_rate(state)
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data),
                               rtol=1e-12)


def test_bc_ops_wildcard_routing(rng):
    grid = pde.CartesianGrid([(0, 1)], 16)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    eq = pde.PDE(
        {"c": "laplace(c) + gradient_squared(c)"},
        bc_ops={"c:laplace": {"value": 1}, "*:gradient_squared": {"derivative": 0}},
    )
    rate = eq.evolution_rate(state)
    assert np.all(np.isfinite(np.asarray(rate.data)))
    # routing differs from uniform BCs
    eq_uniform = pde.PDE({"c": "laplace(c) + gradient_squared(c)"},
                         bc={"value": 1})
    rate_u = eq_uniform.evolution_rate(state)
    assert not np.allclose(np.asarray(rate.data), np.asarray(rate_u.data))


def test_integral_operator(rng):
    """Global coupling through integral() (reference pde.py:574-594)."""
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    eq = pde.PDE({"c": "laplace(c) - integral(c) / 8"})
    rate = eq.evolution_rate(state)
    expected = np.asarray(
        state.laplace("auto_periodic_neumann").data
    ) - float(state.integral) / 8
    np.testing.assert_allclose(np.asarray(rate.data), expected, rtol=1e-10)


def test_complex_expression_promotion(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="ψ")
    eq = pde.PDE({"ψ": "I * laplace(ψ)"})
    rate = eq.evolution_rate(state)
    assert rate.is_complex


def test_time_dependent_rhs(rng):
    grid = pde.UnitGrid([8])
    state = pde.ScalarField(grid, data=0.0, label="c")
    eq = pde.PDE({"c": "sin(t)"})
    r0 = eq.evolution_rate(state, t=0.0)
    r1 = eq.evolution_rate(state, t=np.pi / 2)
    np.testing.assert_allclose(np.asarray(r0.data), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1.data), 1.0, rtol=1e-12)


def test_consts_fields(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    mask = pde.ScalarField.random_uniform(grid, rng=rng, label="m")
    eq = pde.PDE({"c": "laplace(c) + m"}, consts={"m": mask})
    rate = eq.evolution_rate(state)
    expected = np.asarray(state.laplace("auto_periodic_neumann").data) + np.asarray(
        mask.data
    )
    np.testing.assert_allclose(np.asarray(rate.data), expected, rtol=1e-10)


def test_user_funcs(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    eq = pde.PDE({"c": "clip_half(c)"},
                 user_funcs={"clip_half": lambda c: 0.5 * c})
    rate = eq.evolution_rate(state)
    np.testing.assert_allclose(np.asarray(rate.data),
                               0.5 * np.asarray(state.data), rtol=1e-12)


def test_divergence_gradient_expression(rng):
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (12, 12), periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    eq = pde.PDE({"c": "divergence(gradient(c))"})
    rate = eq.evolution_rate(state)
    assert rate.data.shape == state.data.shape
    assert np.all(np.isfinite(np.asarray(rate.data)))


def test_vector_dot_expression(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="c")
    eq = pde.PDE({"c": "dot(gradient(c), gradient(c))"})
    rate = eq.evolution_rate(state)
    assert np.all(np.asarray(rate.data) >= -1e-12)  # |∇c|² is non-negative


def test_pde_repr_and_expressions_attr():
    eq = pde.PDE({"u": "laplace(u)", "v": "u - v"})
    assert set(eq.variables) == {"u", "v"}
    assert "laplace" in str(eq.expressions.get("u", "")) or eq.expressions


def test_pde_rejects_unknown_kwargs():
    with pytest.raises((TypeError, ValueError)):
        pde.PDE({"c": "laplace(c)"}, unknown_option=3)


def test_pde_rejects_bad_variable_names():
    # a variable shadowing an operator name cannot be compiled
    with pytest.raises((ValueError, TypeError)):
        pde.PDE({"laplace": "laplace(laplace)"})


def test_noise_dict_per_field(rng):
    grid = pde.UnitGrid([8], periodic=True)
    u = pde.ScalarField(grid, data=0.0, label="u")
    v = pde.ScalarField(grid, data=0.0, label="v")
    eq = pde.PDE({"u": "0", "v": "0"}, noise={"u": 1.0, "v": 0.0},
                 rng=np.random.default_rng(0))
    res = eq.solve(pde.FieldCollection([u, v]), t_range=0.1, dt=0.01,
                   tracker=None)
    assert float(res[0].fluctuations) > 0
    np.testing.assert_allclose(np.asarray(res[1].data), 0.0, atol=1e-12)
