"""SPMD radial decomposition of curvilinear grids.

One compiled stepper serves every shard: stencil coefficients, coordinates,
cell volumes, and field constants are sliced from the GLOBAL arrays by
``lax.axis_index`` inside ``shard_map`` (``pde_tpu.grids.base``
``axis_coords_traced``/``radial_factor_traced``/... helpers). The reference
instead compiles one operator per MPI rank on its own subgrid
(`/root/reference/pde/grids/_mesh.py:481`); here decomposed runs must stay
BIT-identical to serial ones — every assertion below is exact.
"""

import numpy as np
import pytest

import pde_tpu as pde


def _solve_pair(eq, field, decomposition, *, t_range=0.05, dt=1e-4, **kwargs):
    serial = eq.solve(field, t_range=t_range, dt=dt, tracker=None, **kwargs)
    sharded = eq.solve(
        field, t_range=t_range, dt=dt, tracker=None,
        decomposition=decomposition, **kwargs,
    )
    return np.asarray(serial.data), np.asarray(sharded.data)


@pytest.mark.parametrize(
    "make_grid, decomposition",
    [
        (lambda: pde.PolarSymGrid(1.0, 64), [4]),
        (lambda: pde.PolarSymGrid(1.0, 64), [8]),
        (lambda: pde.SphericalSymGrid(1.0, 64), [4]),
        (lambda: pde.CylindricalSymGrid(1.0, (0, 2), (32, 16)), [4, 2]),
        (lambda: pde.CylindricalSymGrid(1.0, (0, 2), (32, 16)), [8, 1]),
    ],
    ids=["polar-4", "polar-8", "spherical-4", "cyl-r4z2", "cyl-r8"],
)
def test_radial_diffusion_bit_identical(make_grid, decomposition, rng):
    grid = make_grid()
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    ref, res = _solve_pair(pde.DiffusionPDE(0.1), field, decomposition)
    np.testing.assert_array_equal(ref, res)


def test_radial_nonconservative_stencil(rng):
    """The naive (non-flux-form) spherical stencil is shard-aware too."""
    grid = pde.SphericalSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    with pde.config({"operators.conservative_stencil": False}):
        ref, res = _solve_pair(pde.DiffusionPDE(0.1), field, [4])
    np.testing.assert_array_equal(ref, res)


@pytest.mark.parametrize(
    "bc",
    [
        {"r-": {"derivative": 0}, "r+": {"value": 1.0}},
        {"r-": {"derivative": 0}, "r+": {"type": "mixed", "value": 2.0, "const": 1.0}},
        {"r-": {"derivative": 0}, "r+": {"value_expression": "t**2"}},
    ],
    ids=["dirichlet", "robin", "time-dependent"],
)
def test_radial_physical_bcs(bc, rng):
    """Physical BCs apply at the global radial edges (axis_index masking)."""
    grid = pde.PolarSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    ref, res = _solve_pair(pde.DiffusionPDE(0.1, bc=bc), field, [4])
    np.testing.assert_array_equal(ref, res)


def test_radial_integral_in_rhs(rng):
    """integral() inside the sharded loop weights every shard with its own
    slice of the global cell volumes (shard-varying radial factors)."""
    grid = pde.PolarSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u) - integral(u)"})
    ref, res = _solve_pair(eq, field, [4])
    np.testing.assert_array_equal(ref, res)


def test_radial_coordinate_dependent_rhs(rng):
    """Expressions referencing r receive each shard's own coordinates."""
    grid = pde.PolarSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u) + r**2"})
    ref, res = _solve_pair(eq, field, [4])
    np.testing.assert_array_equal(ref, res)


def test_cartesian_coordinate_dependent_rhs(rng):
    """Regression: decomposed Cartesian grids used to evaluate x/y in the
    rhs with shard-0's template coordinates on EVERY shard (silently wrong,
    maxdiff ~0.2 on this configuration)."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, (32, 32), periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u) + sin(x) * cos(y)"})
    ref, res = _solve_pair(eq, field, [2, 2], dt=1e-3)
    np.testing.assert_array_equal(ref, res)


def test_field_constant_sliced_per_shard(rng):
    """DataField constants in expression PDEs live on the global grid and
    are dynamic-sliced per shard inside the rhs."""
    grid = pde.CartesianGrid([(0, 1)] * 2, (32, 32), periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    source = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u) + s"}, consts={"s": source})
    ref, res = _solve_pair(eq, field, [2, 2], dt=1e-3)
    np.testing.assert_array_equal(ref, res)


def test_radial_adaptive_solver(rng):
    """Adaptive RK on a decomposed spherical grid: the pmax error sync and
    the shard-aware stencils compose."""
    grid = pde.SphericalSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1)
    ref, res = _solve_pair(
        eq, field, [4], solver="runge-kutta", adaptive=True
    )
    np.testing.assert_array_equal(ref, res)


def test_radial_operator_chain(rng):
    """Custom PDE chaining gradient -> divergence on a decomposed spherical
    grid (vector ghost cells + r-dependent divergence factors)."""

    class GradDivPDE(pde.PDEBase):
        def evolution_rate(self, state, t=0):
            grad = state.gradient({"r-": {"derivative": 0}, "r+": {"value": 0}})
            return 0.1 * grad.divergence(
                {"r-": {"normal_derivative": 0}, "r+": {"normal_value": 0}}
            )

    grid = pde.SphericalSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    ref, res = _solve_pair(GradDivPDE(), field, [4], t_range=0.02)
    np.testing.assert_array_equal(ref, res)


def test_radial_sde_runs(rng):
    """Decomposed radial SDE: per-shard decorrelated noise scaled with the
    shard's own cell volumes; statistics checked, streams differ by design."""
    grid = pde.PolarSymGrid(1.0, 64)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1, noise=0.01)
    res = eq.solve(
        field, t_range=0.01, dt=1e-4, tracker=None, decomposition=[4]
    )
    assert np.all(np.isfinite(np.asarray(res.data)))


def test_milstein_radial_noise_scaling(rng):
    """Regression: MilsteinSolver baked the shard-0 template's cell volumes,
    inflating outer-shard noise ~sqrt(33)x on PolarSymGrid(1, 64) with
    decomposition=[4]. The per-shard noise amplitude must now match the
    serial solver's (both scale with the TRUE local cell volumes)."""
    from pde_tpu.solvers import Controller, MilsteinSolver

    grid = pde.PolarSymGrid(1.0, 64)
    field = pde.ScalarField(grid, data=np.zeros(64))
    eq = pde.DiffusionPDE(0.0, noise=1e-4)

    def noise_std_profile(decomposition):
        # with zero diffusivity and zero state, the result IS the accumulated
        # noise; its std per radial block measures the local amplitude
        outs = []
        for seed in (1, 2, 3, 4):
            eq.rng = np.random.default_rng(seed)  # decorrelates the runs
            solver = MilsteinSolver(eq, decomposition=decomposition)
            res = Controller(solver, t_range=0.01, tracker=None).run(
                field, 1e-4
            )
            outs.append(np.asarray(res.data))
        return np.std(np.stack(outs), axis=0).reshape(4, 16).mean(axis=1)

    serial = noise_std_profile(None)
    decomposed = noise_std_profile([4])
    # inner cells (small volume) are noisier; profile must match serial
    # within statistical scatter — the pre-fix bug was a sqrt(33)x error
    ratio = decomposed / serial
    assert np.all(ratio < 2.0) and np.all(ratio > 0.5), ratio
