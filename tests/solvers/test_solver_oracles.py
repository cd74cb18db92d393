"""Statistical and analytic solver oracles.

Mirrors the reference's strongest solver tests
(`tests/solvers/test_explicit_solvers.py:169-283`): geometric Brownian motion
moments, Ornstein-Uhlenbeck equilibrium variance, adaptive NaN recovery, and
time-dependent rhs accuracy.
"""

import jax
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.models.base import SDEBase


class GeometricBrownianMotion(SDEBase):
    """dX = mu X dt + sigma X dW (Itô), per grid cell independently."""

    def __init__(self, mu=0.5, sigma=0.3, noise_interpretation="ito"):
        super().__init__(noise=1.0, noise_interpretation=noise_interpretation)
        self.mu = mu
        self.sigma = sigma

    def evolution_rate(self, state, t=0.0):
        return self.mu * state

    def make_noise_variance(self, state, *, ret_diff=False):
        sigma2 = self.sigma**2

        if ret_diff:
            def noise_var_diff(leaves, t):
                return [sigma2 * y * y for y in leaves], [2 * sigma2 * y for y in leaves]

            return noise_var_diff

        def noise_var(leaves, t):
            return [sigma2 * y * y for y in leaves]

        return noise_var


class OrnsteinUhlenbeck(SDEBase):
    """dX = -k X dt + sigma dW; stationary variance sigma^2 / (2 k)."""

    def __init__(self, k=1.0, sigma=0.5):
        super().__init__(noise=sigma**2)
        self.k = k

    def evolution_rate(self, state, t=0.0):
        return -self.k * state


@pytest.mark.parametrize("solver", ["euler", "milstein"])
def test_geometric_brownian_motion_moments(solver):
    """E[X_t] = X0 exp(mu t) regardless of sigma (Itô interpretation)."""
    mu, sigma, t_end = 0.5, 0.3, 0.5
    grid = pde.UnitGrid([2048], periodic=True)  # many independent samples
    state = pde.ScalarField(grid, 1.0)
    eq = GeometricBrownianMotion(mu=mu, sigma=sigma)
    eq.rng = np.random.default_rng(5)
    result = eq.solve(state, t_range=t_end, dt=1e-3, solver=solver, tracker=None)
    values = result.to_numpy()
    assert np.all(values > 0) or solver == "euler"  # EM can touch zero, rarely
    mean = values.mean()
    expected = np.exp(mu * t_end)
    # standard error of the mean: std ≈ expected * sigma * sqrt(t)
    tol = 5 * expected * sigma * np.sqrt(t_end) / np.sqrt(values.size)
    assert abs(mean - expected) < tol


def test_ornstein_uhlenbeck_equilibrium():
    """Long-run variance of the OU process matches sigma^2/(2k)."""
    k, sigma = 1.0, 0.5
    grid = pde.UnitGrid([4096], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    eq = OrnsteinUhlenbeck(k=k, sigma=sigma)
    eq.rng = np.random.default_rng(3)
    result = eq.solve(state, t_range=8.0, dt=1e-2, tracker=None)
    measured = result.to_numpy().var()
    expected = sigma**2 / (2 * k)
    assert abs(measured - expected) < 0.15 * expected


def test_stratonovich_gbm_mean_growth():
    """Under Stratonovich, E[X_t] = X0 exp((mu + sigma^2/2) t)."""
    mu, sigma, t_end = 0.2, 0.4, 0.5
    grid = pde.UnitGrid([4096], periodic=True)
    state = pde.ScalarField(grid, 1.0)
    eq = GeometricBrownianMotion(mu=mu, sigma=sigma,
                                 noise_interpretation="stratonovich")
    eq.rng = np.random.default_rng(11)
    result = eq.solve(state, t_range=t_end, dt=1e-3, tracker=None)
    mean = result.to_numpy().mean()
    expected = np.exp((mu + sigma**2 / 2) * t_end)
    tol = 5 * expected * sigma * np.sqrt(t_end) / np.sqrt(result.to_numpy().size)
    assert abs(mean - expected) < tol
    # and clearly above the Itô growth
    assert mean > np.exp(mu * t_end) + tol / 2


@pytest.mark.parametrize("solver", ["euler", "runge-kutta"])
def test_adaptive_solver_recovers_from_nan(solver):
    """A dt too large for the stiff rhs must be shrunk, not crash."""
    grid = pde.UnitGrid([16])
    state = pde.ScalarField(grid, 1.0)
    eq = pde.PDE({"c": "-1000 * c"})  # stiff decay; explodes at dt=0.1
    result, info = eq.solve(
        state, t_range=0.1, dt=0.1, solver=solver, adaptive=True,
        tracker=None, ret_info=True,
    )
    values = result.to_numpy()
    assert np.all(np.isfinite(values))
    np.testing.assert_allclose(values, np.exp(-1000 * 0.1), atol=1e-3)
    solver_info = info["solver"]
    assert solver_info.get("dt_adaptive", True)


@pytest.mark.parametrize(
    "solver, adaptive",
    [("euler", False), ("euler", True), ("runge-kutta", False),
     ("runge-kutta", True), ("adams-bashforth", False)],
)
def test_time_dependent_rhs_accuracy(solver, adaptive):
    """dc/dt = sin(t) integrates to 1 - cos(t) for every stepper."""
    grid = pde.UnitGrid([4])
    state = pde.ScalarField(grid, 0.0)
    eq = pde.PDE({"c": "sin(t)"})
    t_end = 2.0
    kwargs = {"adaptive": True} if adaptive else {}
    result = eq.solve(state, t_range=t_end, dt=1e-3, solver=solver,
                      tracker=None, **kwargs)
    np.testing.assert_allclose(
        result.to_numpy(), 1 - np.cos(t_end), atol=5e-3
    )


def test_euler_maruyama_strong_order_half():
    """Halving dt shrinks the strong error of Euler-Maruyama (sanity check
    of the dt-scaling of the noise increments)."""
    mu, sigma, t_end = 0.0, 0.5, 0.25
    grid = pde.UnitGrid([512], periodic=True)
    state = pde.ScalarField(grid, 1.0)

    means = {}
    for dt in (1e-2, 1e-3):
        eq = GeometricBrownianMotion(mu=mu, sigma=sigma)
        eq.rng = np.random.default_rng(21)
        res = eq.solve(state, t_range=t_end, dt=dt, tracker=None)
        means[dt] = res.to_numpy().mean()
    # both estimates must agree with E[X]=1 within sampling error
    for dt, m in means.items():
        assert abs(m - 1.0) < 5 * sigma * np.sqrt(t_end) / np.sqrt(512), (dt, m)


def test_adaptive_stochastic_rejected(rng):
    """Adaptive stepping with noise raises, matching the reference
    (`tests/solvers/test_explicit_solvers.py:283`)."""
    grid = pde.UnitGrid([16])
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(noise=1e-6)
    with pytest.raises(RuntimeError, match="adaptive"):
        eq.solve(state, t_range=0.1, dt=1e-2, adaptive=True, tracker=None)
