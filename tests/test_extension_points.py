"""User-facing extension points: custom operators, solvers, trackers, PDEs.

The reference documents these as the supported ways to extend the framework
(`backends/base.py:257` register_operator, `solvers/base.py:92-143` name
registry, tracker registry); this file exercises each end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.solvers.base import SolverBase


def test_custom_operator_registration(rng):
    """Register a custom operator on a grid class and use it everywhere."""
    from pde_tpu.grids.cartesian import CartesianGrid

    name = "double_laplace_test"
    if name in CartesianGrid.operators():
        pytest.skip("operator already registered from a previous run")

    @CartesianGrid.register_operator(name)
    def make_double_laplace(grid, bcs=None, **kwargs):
        laplace = grid.make_operator("laplace", bc=bcs, jit=False)

        def double_laplace(data, t=0.0, args=None):
            return 2 * laplace(data, t, args)

        return double_laplace

    try:
        assert name in CartesianGrid.operators()
        grid = pde.UnitGrid([8, 8], periodic=True)
        field = pde.ScalarField.random_uniform(grid, rng=rng)

        # via make_operator
        op = grid.make_operator(name, bc="periodic")
        expected = 2 * field.laplace("periodic").to_numpy()
        np.testing.assert_allclose(np.asarray(op(field.data)), expected, atol=1e-12)

        # via apply_operator on the field
        result = field.apply_operator(name, bc="periodic")
        np.testing.assert_allclose(result.to_numpy(), expected, atol=1e-12)

        # via the expression PDE compiler
        eq = pde.PDE({"c": f"{name}(c)"})
        rate = eq.evolution_rate(field)
        np.testing.assert_allclose(rate.to_numpy(), expected, atol=1e-12)
    finally:
        del CartesianGrid._operators[name]


def test_custom_solver_registration(rng):
    """A SolverBase subclass with a `name` is usable via solve(solver=name)."""

    class HeunTestSolver(SolverBase):
        """Explicit Heun (trapezoidal predictor-corrector) method."""

        name = "heun_test"

        def _make_single_step_fixed_dt(self, state, dt):
            rhs = self.pde.make_pde_rhs(state)

            def single_step(leaves, t, key):
                k1 = rhs(leaves, t)
                pred = [y + dt * k for y, k in zip(leaves, k1)]
                k2 = rhs(pred, t + dt)
                return [
                    y + dt / 2 * (a + b) for y, a, b in zip(leaves, k1, k2)
                ]

            return single_step

    from pde_tpu.solvers import registered_solvers

    assert "heun_test" in registered_solvers()

    grid = pde.UnitGrid([8])
    state = pde.ScalarField(grid, 1.0)
    eq = pde.PDE({"c": "-c"})
    result = eq.solve(state, t_range=1.0, dt=1e-2, solver="heun_test", tracker=None)
    # Heun is 2nd order: much closer to exp(-1) than Euler at this dt
    np.testing.assert_allclose(result.to_numpy(), np.exp(-1.0), atol=1e-5)


def test_custom_solver_instance_passed_directly(rng):
    """solve() also accepts a solver instance or class."""
    grid = pde.UnitGrid([8])
    state = pde.ScalarField(grid, 1.0)
    eq = pde.PDE({"c": "-c"})
    solver = pde.solvers.RungeKuttaSolver(eq, adaptive=False)
    controller = pde.solvers.Controller(solver, t_range=1.0, tracker=None)
    result = controller.run(state, dt=1e-2)
    np.testing.assert_allclose(result.to_numpy(), np.exp(-1.0), atol=1e-8)


def test_custom_tracker_subclass(rng):
    """TrackerBase subclasses plug into the controller loop."""
    from pde_tpu.trackers.base import TrackerBase

    class RecordingTracker(TrackerBase):
        def __init__(self, interrupts=0.1):
            super().__init__(interrupts=interrupts)
            self.times = []

        def handle(self, state, t):
            self.times.append(float(t))

    tracker = RecordingTracker()
    grid = pde.UnitGrid([8])
    eq = pde.DiffusionPDE()
    eq.solve(pde.ScalarField(grid, 1.0), t_range=0.5, dt=0.01, tracker=tracker)
    assert len(tracker.times) >= 5
    assert tracker.times == sorted(tracker.times)


def test_custom_pde_with_custom_operator_rhs(rng):
    """Custom PDEs may build their rhs from hand-composed jnp functions."""

    class BiasedDiffusion(pde.PDEBase):
        def __init__(self, bias):
            super().__init__()
            self.bias = bias

        def evolution_rate(self, state, t=0):
            return state.laplace("auto_periodic_neumann") + self.bias

        def make_pde_rhs(self, state, backend="jax"):
            laplace = state.grid.make_operator("laplace", bc="auto_periodic_neumann")
            bias = self.bias

            def rhs(leaves, t):
                return [laplace(y) + bias for y in leaves]

            return rhs

    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = BiasedDiffusion(bias=0.5)
    eq.check_rhs_consistency(state)
    result = eq.solve(state, t_range=1.0, dt=0.01, tracker=None)
    # the mean grows linearly with the bias
    np.testing.assert_allclose(
        float(result.average), float(state.average) + 0.5, atol=1e-6
    )


def test_boundary_user_function_setter(rng):
    """BoundariesSetter: a user function writing ghost cells directly."""
    from pde_tpu.grids.boundaries.axes import BoundariesSetter

    def setter(data_full, args=None):
        # fix both x-ghost layers to 7 and keep y periodic-like wrap
        data_full = data_full.at[0, :].set(7.0)
        data_full = data_full.at[-1, :].set(7.0)
        data_full = data_full.at[:, 0].set(data_full[:, -2])
        data_full = data_full.at[:, -1].set(data_full[:, 1])
        return data_full

    grid = pde.UnitGrid([6, 6])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    full = np.asarray(field.get_full_data(BoundariesSetter(setter)))
    np.testing.assert_allclose(full[0], 7.0)
    np.testing.assert_allclose(full[-1], 7.0)
