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


class TestIncrementDraw:
    """`sde.increment_dist` selects the Euler-Maruyama increment law
    (weak order 1 needs only the Gaussian's first three moments)."""

    @pytest.mark.parametrize("dist", ["normal", "irwin4", "rademacher"])
    def test_moments(self, dist):
        from pde_tpu.models.base import make_increment_draw

        with pde.config({"sde.increment_dist": dist}):
            draw = make_increment_draw()
        x = np.asarray(draw(jax.random.key(0), (200, 500), jnp.float32))
        assert x.dtype == np.float32
        assert abs(x.mean()) < 0.02
        assert abs(x.var() - 1.0) < 0.02
        # third moment matches the Gaussian's (all three laws are symmetric)
        assert abs((x**3).mean()) < 0.05

    @pytest.mark.parametrize("dist", ["irwin4", "rademacher"])
    def test_complex_dtype(self, dist):
        from pde_tpu.models.base import make_increment_draw

        with pde.config({"sde.increment_dist": dist}):
            draw = make_increment_draw()
        z = np.asarray(draw(jax.random.key(1), (100, 100), jnp.complex64))
        assert z.dtype == np.complex64
        # jax convention: complex normal has total variance 1
        assert abs(np.var(z) - 1.0) < 0.03
        assert abs(np.var(z.real) - 0.5) < 0.03

    def test_unknown_dist(self):
        from pde_tpu.models.base import make_increment_draw

        with pde.config({"sde.increment_dist": "cauchy"}):
            with pytest.raises(ValueError, match="cauchy"):
                make_increment_draw()

    @pytest.mark.parametrize("dist", ["irwin4", "rademacher"])
    def test_solve_statistics_match_normal(self, dist, rng):
        """Additive-noise diffusion: same variance growth under any law."""
        grid = pde.UnitGrid([32, 32], periodic=True)
        state = pde.ScalarField(grid, 0.0)
        eq = pde.DiffusionPDE(diffusivity=0.1, noise=1.0, rng=rng)
        ref = eq.solve(state, t_range=0.5, dt=1e-3, tracker=None)
        with pde.config({"sde.increment_dist": dist}):
            res = eq.solve(state, t_range=0.5, dt=1e-3, tracker=None)
        assert abs(
            float(res.fluctuations) / float(ref.fluctuations) - 1.0
        ) < 0.15


class TestKernelNoiseSpec:
    """Gating of the in-kernel hardware-PRNG noise path."""

    def _spec(self, **cfg):
        grid = pde.UnitGrid([256, 256], periodic=True)
        eq = pde.PDE({"c": "laplace(c)"}, noise=0.5)
        with pde.config(cfg):
            return eq._sde_kernel_noise_spec(grid, 1e-4, False), grid

    def test_auto_normal_stays_external(self):
        spec, _ = self._spec()
        assert spec is None  # auto + normal -> bit-reproducible XLA stream

    def test_auto_cheap_law_activates(self):
        spec, grid = self._spec(**{"sde.increment_dist": "irwin4"})
        assert spec == {
            "dist": "irwin4",
            "scale": float(
                np.sqrt(1e-4 * 0.5 / np.prod(grid.discretization))
            ),
        }

    def test_on_activates_box_muller(self):
        spec, _ = self._spec(**{"sde.kernel_noise": "on"})
        assert spec is not None and spec["dist"] == "normal"

    def test_off_forces_external(self):
        spec, _ = self._spec(**{
            "sde.kernel_noise": "off", "sde.increment_dist": "irwin4",
        })
        assert spec is None

    def test_interpret_forces_external(self):
        grid = pde.UnitGrid([256, 256], periodic=True)
        eq = pde.PDE({"c": "laplace(c)"}, noise=0.5)
        with pde.config({"sde.increment_dist": "irwin4"}):
            assert eq._sde_kernel_noise_spec(grid, 1e-4, True) is None

    def test_fused_sde_interpret_matches_unfused_any_dist(
        self, rng, monkeypatch
    ):
        """Interpret mode stages increments externally with the unfused
        stepper's key folding — trajectories stay bit-comparable under ANY
        increment law (the law applies to both streams)."""
        monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
        from pde_tpu.solvers.euler import EulerSolver

        grid = pde.UnitGrid([16, 16], periodic=True)
        state = pde.ScalarField(grid, 0.0)
        with pde.config({"sde.increment_dist": "irwin4"}):
            eq = pde.DiffusionPDE(
                diffusivity=0.1, noise=1.0, rng=np.random.default_rng(3)
            )
            solver = EulerSolver(eq)
            solver._key = jax.random.key(42)
            out, _ = solver.make_stepper(state, dt=1e-3)(state, 0.0, 0.05)
            assert solver.info.get("fused_step") is True

            monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
            solver2 = EulerSolver(eq)
            solver2._key = jax.random.key(42)
            ref, _ = solver2.make_stepper(state, dt=1e-3)(state, 0.0, 0.05)
        np.testing.assert_allclose(
            np.asarray(out.data), np.asarray(ref.data), rtol=1e-6, atol=1e-9
        )
