"""Tests for the predefined PDE models (mirrors reference tests/pdes/)."""

import numpy as np
import pytest

import pde_tpu as pde


@pytest.mark.parametrize(
    "eq_factory",
    [
        lambda: pde.DiffusionPDE(diffusivity=0.7),
        lambda: pde.AllenCahnPDE(interface_width=0.5),
        lambda: pde.CahnHilliardPDE(interface_width=1.0),
        lambda: pde.KPZInterfacePDE(nu=0.5, lmbda=1.0),
        lambda: pde.KuramotoSivashinskyPDE(nu=1.0),
        lambda: pde.SwiftHohenbergPDE(rate=0.1),
    ],
)
def test_scalar_pde_consistency(eq_factory, rng):
    """make_pde_rhs must match evolution_rate and produce finite values."""
    grid = pde.UnitGrid([12, 12], periodic=True)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = eq_factory()
    eq.check_rhs_consistency(state)
    rate = eq.evolution_rate(state, 0.0)
    assert np.all(np.isfinite(np.asarray(rate.data)))
    assert eq.expression  # human-readable form exists


def test_diffusion_decay(rng):
    grid = pde.CartesianGrid([(0, 2 * np.pi)], 64, periodic=True)
    state = pde.ScalarField.from_expression(grid, "sin(x)")
    eq = pde.DiffusionPDE(diffusivity=1.0)
    result = eq.solve(state, t_range=1.0, dt=1e-3, tracker=None)
    expected = np.exp(-1.0) * np.asarray(state.data)
    np.testing.assert_allclose(np.asarray(result.data), expected, atol=2e-3)


def test_diffusion_dirichlet_steady_state():
    grid = pde.CartesianGrid([(0, 1)], 32)
    state = pde.ScalarField(grid, 0.0)
    eq = pde.DiffusionPDE(bc={"x-": {"value": 0}, "x+": {"value": 1}})
    result = eq.solve(state, t_range=5.0, dt=1e-4, tracker=None)
    # steady state of diffusion with Dirichlet BCs is linear
    np.testing.assert_allclose(
        np.asarray(result.data), grid.axes_coords[0], atol=1e-3
    )


def test_cahn_hilliard_conservation(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, -0.5, 0.5, rng=rng)
    eq = pde.CahnHilliardPDE()
    result = eq.solve(state, t_range=1.0, dt=1e-3, tracker=None)
    assert float(result.integral) == pytest.approx(float(state.integral), abs=1e-8)
    # phase separation increases amplitude
    assert float(result.fluctuations) != float(state.fluctuations)


def test_wave_and_klein_gordon(rng):
    grid = pde.CartesianGrid([(0, 10)], 64, periodic=True)
    u0 = pde.ScalarField.from_expression(grid, "exp(-(x-5)**2)")
    for eq in [pde.WavePDE(speed=2), pde.KleinGordonPDE(speed=1, mass=0.5)]:
        init = eq.get_initial_condition(u0)
        assert init.labels == ["u", "v"]
        result = eq.solve(init, t_range=0.5, dt=1e-3, tracker=None)
        assert np.all(np.isfinite(np.asarray(result[0].data)))
        assert eq.expressions["u"] == "v"


def test_reaction_diffusion():
    grid = pde.UnitGrid([8, 8], periodic=True)
    eq = pde.ReactionDiffusionPDE(
        variables=["u", "v"],
        diffusivity=[0.1, 0.05],
        sources=["u - u**3 - v", "0.5 * (u - v)"],
    )
    state = pde.FieldCollection.scalar_random_uniform(
        2, grid, -0.1, 0.1, labels=["u", "v"], rng=np.random.default_rng(0)
    )
    eq.check_rhs_consistency(state)
    result = eq.solve(state, t_range=1.0, dt=0.01, tracker=None)
    assert np.all(np.isfinite(np.asarray(result[0].data)))
    assert "∇²u" in eq.expressions["u"]


def test_pde_noise_flag():
    assert not pde.DiffusionPDE().is_sde
    assert pde.DiffusionPDE(noise=0.1).is_sde
    with pytest.raises(ValueError):
        pde.DiffusionPDE(noise=0.1, rng=None).noise_interpretation  # fine
        pde.models.base.SDEBase(noise=1, noise_interpretation="bogus")
