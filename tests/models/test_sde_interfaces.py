"""Tests for the SDE noise interfaces (variance, realization, interpretations).

Mirrors reference tests around `pdes/base.py:568-700` and `solvers/euler.py:66`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.models.base import SDEBase


class MultiplicativeNoisePDE(SDEBase):
    """dc = lap(c) dt + sqrt(c^2) dW — multiplicative noise via the variance
    interface (variance = c^2, derivative = 2c)."""

    def __init__(self, noise_interpretation="ito"):
        super().__init__(noise=1.0, noise_interpretation=noise_interpretation)
        self.bc = "auto_periodic_neumann"

    def evolution_rate(self, state, t=0.0):
        return state.laplace(bc=self.bc, args={"t": t})

    def make_noise_variance(self, state, *, ret_diff=False):
        if ret_diff:
            def noise_var_diff(leaves, t):
                variances = [y * y for y in leaves]
                diffs = [2 * y for y in leaves]
                return variances, diffs

            return noise_var_diff

        def noise_var(leaves, t):
            return [y * y for y in leaves]

        return noise_var


class RealizationNoisePDE(SDEBase):
    """Noise supplied directly as a realization (use_noise_realization)."""

    use_noise_variance = False
    use_noise_realization = True

    def __init__(self):
        super().__init__(noise=0)
        self.bc = "auto_periodic_neumann"

    def evolution_rate(self, state, t=0.0):
        return 0 * state

    def make_noise_realization(self, state, backend="jax"):
        shape = np.asarray(state.data).shape

        def realization(leaves, t, key):
            return [3.0 * jax.random.normal(key, shape)]

        return realization


def test_multiplicative_noise_interpretations(rng):
    grid = pde.UnitGrid([16], periodic=True)
    state = pde.ScalarField(grid, 1.0)
    results = {}
    for interp in ["ito", "stratonovich", "anti-ito"]:
        eq = MultiplicativeNoisePDE(noise_interpretation=interp)
        eq.rng = np.random.default_rng(42)
        assert eq.is_sde
        res = eq.solve(state, t_range=0.2, dt=1e-3, tracker=None)
        results[interp] = float(res.average)
        assert np.all(np.isfinite(np.asarray(res.data)))
    # the drift correction shifts the mean: ito < stratonovich < anti-ito
    assert results["ito"] < results["stratonovich"] < results["anti-ito"]


def test_noise_realization_interface():
    grid = pde.UnitGrid([32], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    eq = RealizationNoisePDE()
    assert eq.is_sde
    eq.rng = np.random.default_rng(0)
    res = eq.solve(state, t_range=1.0, dt=0.01, tracker=None)
    # pure additive noise with amplitude 3: std ~ 3*sqrt(t) = 3
    std = float(jnp.std(res.data))
    assert 1.0 < std < 6.0


def test_milstein_multiplicative(rng):
    grid = pde.UnitGrid([16], periodic=True)
    state = pde.ScalarField(grid, 1.0)
    eq = MultiplicativeNoisePDE()
    eq.rng = np.random.default_rng(7)
    res = eq.solve(state, t_range=0.1, dt=1e-3, solver="milstein", tracker=None)
    assert np.all(np.isfinite(np.asarray(res.data)))


def test_invalid_noise_interpretation():
    with pytest.raises(ValueError):
        SDEBase(noise=1.0, noise_interpretation="bogus")


def test_callable_expression_bc():
    """ExpressionBC with a python function (value, dx, x, t) -> value."""
    grid = pde.CartesianGrid([(0, 1)], 8)

    def bc_value(adjacent, dx, x, t):
        return 2.0  # Dirichlet value computed by a function

    bcs = grid.get_boundary_conditions(
        {"x-": {"value": 0}, "x+": {"type": "virtual_point",
                                    "value": lambda adj, dx, x, t: 2 * 2.0 - adj}}
    )
    field = pde.ScalarField(grid, 0.0)
    full = np.asarray(field.get_full_data(bcs))
    assert full[-1] == pytest.approx(4.0)  # virtual point = 2*value - adjacent

    bcs2 = grid.get_boundary_conditions(
        {"x-": {"value": 0},
         "x+": {"type": "value", "value": lambda adj, dx, x, t: 2.0}}
    )
    full2 = np.asarray(field.get_full_data(bcs2))
    assert full2[-1] == pytest.approx(4.0)
