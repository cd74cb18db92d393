"""Per-model depth: every predefined PDE against its expression form,
dispersion relations, and documented analytic behavior.

Extends toward the reference's per-PDE suites (`/root/reference/tests/pdes/`).
"""

import numpy as np
import pytest

import pde_tpu as pde


def _compare_rates(eq, expr_eq, state, rtol=1e-10):
    r1 = eq.evolution_rate(state)
    r2 = expr_eq.evolution_rate(state)
    if isinstance(r1, pde.FieldCollection):
        for a, b in zip(r1, r2):
            np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data),
                                       rtol=rtol, atol=1e-10)
    else:
        np.testing.assert_allclose(np.asarray(r1.data), np.asarray(r2.data),
                                   rtol=rtol, atol=1e-10)


def test_diffusion_matches_expression(rng):
    grid = pde.UnitGrid([12, 12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    _compare_rates(
        pde.DiffusionPDE(0.7), pde.PDE({"c": "0.7 * laplace(c)"}), state
    )


def test_allen_cahn_matches_expression(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    _compare_rates(
        pde.AllenCahnPDE(interface_width=2.0),
        pde.PDE({"c": "2.0 * laplace(c) + c - c**3"}),
        state,
    )


def test_cahn_hilliard_matches_expression(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    _compare_rates(
        pde.CahnHilliardPDE(interface_width=1.5),
        pde.PDE({"c": "laplace(c**3 - c - 1.5 * laplace(c))"}),
        state,
    )


def test_kpz_matches_expression(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    _compare_rates(
        pde.KPZInterfacePDE(nu=0.5, lmbda=2.0),
        pde.PDE({"h": "0.5 * laplace(h) + 2.0 * gradient_squared(h)"}),
        state,
    )


def test_kuramoto_sivashinsky_matches_expression(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    _compare_rates(
        pde.KuramotoSivashinskyPDE(),
        pde.PDE({"u": "-laplace(u + laplace(u)) - gradient_squared(u) / 2"}),
        state,
    )


def test_swift_hohenberg_matches_expression(rng):
    grid = pde.UnitGrid([12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.SwiftHohenbergPDE(rate=0.1, kc2=1.0, delta=1.0)
    # expanded form of (rate - (kc2 + ∇²)²)c + delta c² - c³
    expr = pde.PDE(
        {"c": "(0.1 - 1.0) * c - 2.0 * laplace(c) - laplace(laplace(c))"
              " + 1.0 * c**2 - c**3"}
    )
    _compare_rates(eq, expr, state)


def test_wave_pde_structure(rng):
    grid = pde.UnitGrid([12], periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    eq = pde.WavePDE(speed=2.0)
    state = eq.get_initial_condition(u)
    assert isinstance(state, pde.FieldCollection)
    rate = eq.evolution_rate(state)
    # du/dt = v (initially zero), dv/dt = c² ∇²u
    np.testing.assert_allclose(np.asarray(rate[0].data), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rate[1].data),
        4.0 * np.asarray(u.laplace("auto_periodic_neumann").data),
        rtol=1e-10,
    )


def test_klein_gordon_reduces_to_wave(rng):
    grid = pde.UnitGrid([12], periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    kg = pde.KleinGordonPDE(mass=0.0, speed=1.0)
    wave = pde.WavePDE(speed=1.0)
    state = wave.get_initial_condition(u)
    _compare_rates(kg, wave, state)


def test_reaction_diffusion_matches_expression(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.ScalarField.random_uniform(grid, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.ReactionDiffusionPDE(
        ["u", "v"], [1.0, 0.2], {"u": "u - u * v", "v": "u * v - v"}
    )
    expr = pde.PDE({
        "u": "laplace(u) + u - u * v",
        "v": "0.2 * laplace(v) + u * v - v",
    })
    _compare_rates(eq, expr, state)


@pytest.mark.parametrize(
    "eq",
    [
        pde.DiffusionPDE(0.3),
        pde.AllenCahnPDE(),
        pde.CahnHilliardPDE(),
        pde.KPZInterfacePDE(),
        pde.KuramotoSivashinskyPDE(),
        pde.SwiftHohenbergPDE(),
    ],
    ids=lambda e: type(e).__name__,
)
def test_expression_property_is_valid(eq):
    """Every predefined PDE reports a parseable expression string."""
    assert isinstance(eq.expression, str) and eq.expression


@pytest.mark.parametrize(
    "eq",
    [pde.DiffusionPDE(0.3), pde.AllenCahnPDE(), pde.CahnHilliardPDE()],
    ids=lambda e: type(e).__name__,
)
def test_rhs_consistency_check(eq, rng):
    """check_rhs_consistency validates compiled vs field-level rhs."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq.check_rhs_consistency(state)


def test_diffusion_dispersion_relation():
    """PDE.dispersion_relation of diffusion gives -D k²."""
    eq = pde.PDE({"c": "0.5 * laplace(c)"})
    if not hasattr(eq, "dispersion_relation"):
        pytest.skip("dispersion_relation not exposed")
    ks, growth = eq.dispersion_relation(pde.UnitGrid([16], periodic=True))
    np.testing.assert_allclose(np.asarray(growth),
                               -0.5 * np.asarray(ks) ** 2, rtol=1e-6)


def test_diffusion_decays_to_mean(rng):
    grid = pde.UnitGrid([16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    result = pde.DiffusionPDE(1.0).solve(state, t_range=100, dt=0.1,
                                         tracker=None)
    np.testing.assert_allclose(
        np.asarray(result.data), float(state.average), rtol=1e-4
    )


def test_swift_hohenberg_pattern_growth(rng):
    """SH above threshold grows patterns from noise (|c| increases)."""
    grid = pde.CartesianGrid([(0, 12.5)], 32, periodic=True)
    state = 0.01 * pde.ScalarField.random_normal(grid, rng=rng)
    eq = pde.SwiftHohenbergPDE(rate=0.5)
    # explicit Euler stability for the biharmonic term needs dt ≲ dx⁴/8
    result = eq.solve(state, t_range=20, dt=1e-3, tracker=None)
    assert float(result.fluctuations) > float(state.fluctuations)


def test_kpz_stochastic_roughening(rng):
    grid = pde.UnitGrid([64], periodic=True)
    state = pde.ScalarField(grid, data=0.0)
    eq = pde.KPZInterfacePDE(noise=0.5, rng=rng)
    result = eq.solve(state, t_range=1.0, dt=1e-3, tracker=None)
    assert float(result.fluctuations) > 0  # interface roughens
