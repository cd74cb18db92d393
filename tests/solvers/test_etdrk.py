"""ETDRK4 exponential integrator (spectral-exact stiff linear part).

No reference equivalent — py-pde hands stiff problems to scipy's host-side
implicit integrators (`/root/reference/pde/solvers/scipy.py:17`); ETDRK4
runs on-device inside the compiled window loop.
"""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.solvers import ETDRK4Solver


def test_registered_name():
    assert "etdrk4" in pde.solvers.registered_solvers()


def test_linear_diffusion_exact():
    """With N = 0 the integrator is EXACT for the FD semi-discretization at
    any dt: each rfft mode decays with exp(lambda_fd * t)."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, (32, 32), periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x) * cos(2*y)")
    eq = pde.PDE({"u": "0.3 * laplace(u)"})
    res = eq.solve(field, t_range=1.0, dt=0.5, solver="etdrk4", tracker=None)
    dx = 2 * np.pi / 32
    lam = -(4 / dx**2) * (np.sin(1 * dx / 2) ** 2 + np.sin(2 * dx / 2) ** 2)
    exact = np.asarray(field.data) * np.exp(0.3 * lam * 1.0)
    np.testing.assert_allclose(np.asarray(res.data), exact, atol=1e-12)


def test_cahn_hilliard_matches_euler(rng):
    """Same FD semi-discretization as the explicit solvers: the trajectory
    matches a fine-dt Euler reference at 100x the step size."""
    grid = pde.UnitGrid([32, 32], periodic=True)
    field = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
    ref = eq.solve(field, t_range=1.0, dt=1e-5, solver="euler", tracker=None)
    res = eq.solve(field, t_range=1.0, dt=1e-2, solver="etdrk4", tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=2e-6
    )


def test_kuramoto_sivashinsky_matches_rk4():
    """KS (biharmonic stiffness, gradient_squared nonlinearity) at 50x the
    RK4 step size."""
    eq = pde.PDE({"u": "-laplace(u) - laplace(laplace(u)) - gradient_squared(u) / 2"})
    grid = pde.CartesianGrid([(0, 32 * np.pi)], (256,), periodic=True)
    field = pde.ScalarField.from_expression(grid, "cos(x / 16) * (1 + sin(x / 16))")
    ref = eq.solve(field, t_range=5.0, dt=1e-3, solver="runge-kutta",
                   adaptive=False, tracker=None)
    res = eq.solve(field, t_range=5.0, dt=0.05, solver="etdrk4", tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=1e-4
    )


def test_fourth_order_convergence(rng):
    """Self-convergence at ~4th order in dt on Cahn-Hilliard."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})

    def solve(dt):
        return np.asarray(
            eq.solve(field, t_range=0.5, dt=dt, solver="etdrk4", tracker=None).data
        )

    fine = solve(1e-3)
    err = [np.max(np.abs(solve(dt) - fine)) for dt in (2e-2, 1e-2, 5e-3)]
    assert err[0] / err[1] > 6  # ~2^4 = 16 expected; allow slack
    assert err[1] / err[2] > 6


def test_time_dependent_nonlinearity():
    """The nonlinear remainder receives the correct stage times."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)], (64,), periodic=True)
    field = pde.ScalarField(grid, data=np.zeros(64))
    eq = pde.PDE({"u": "laplace(u) + sin(t)"})
    ref = eq.solve(field, t_range=1.0, dt=1e-4, solver="runge-kutta",
                   adaptive=False, tracker=None)
    res = eq.solve(field, t_range=1.0, dt=0.05, solver="etdrk4", tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=1e-6
    )


def test_trackers_and_windows(rng):
    """Tracker interrupts split the run into multiple compiled windows."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u)"})
    times = []
    res = eq.solve(field, t_range=1.0, dt=0.05, solver="etdrk4",
                   tracker=pde.CallbackTracker(lambda s, t: times.append(t),
                                               interrupts=0.25))
    assert len(times) >= 4
    one_shot = eq.solve(field, t_range=1.0, dt=0.05, solver="etdrk4",
                        tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(one_shot.data), rtol=1e-12, atol=1e-14
    )


def test_unsupported_configurations(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)

    with pytest.raises(RuntimeError, match="deterministic"):
        ETDRK4Solver(pde.PDE({"u": "laplace(u)"}, noise=0.1))
    with pytest.raises(NotImplementedError, match="decomposed|Fourier"):
        ETDRK4Solver(pde.PDE({"u": "laplace(u)"}), decomposition=[2, 1])
    # non-periodic grids cannot go through the global FFT
    npgrid = pde.UnitGrid([16, 16])
    npfield = pde.ScalarField.random_uniform(npgrid, rng=rng)
    with pytest.raises(NotImplementedError, match="periodic"):
        pde.PDE({"u": "laplace(u)"}, bc={"derivative": 0}).solve(
            npfield, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None
        )
    # FieldCollection states are not supported
    coll = pde.FieldCollection(
        [pde.ScalarField.random_uniform(grid, rng=rng, label=k) for k in "uv"]
    )
    with pytest.raises(NotImplementedError, match="single"):
        pde.PDE({"u": "laplace(u)", "v": "laplace(v)"}).solve(
            coll, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None
        )
    # predefined PDE classes without an expression split
    class Custom(pde.PDEBase):
        def evolution_rate(self, state, t=0):
            return state.laplace("periodic")

    with pytest.raises(NotImplementedError, match="make_etdrk_parts"):
        Custom().solve(field, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None)


def test_float32_path(rng):
    """f32 states run the spectral step in complex64 without promotion."""
    grid = pde.UnitGrid([32, 32], periodic=True)
    field = pde.ScalarField(
        grid,
        data=np.asarray(
            pde.ScalarField.random_uniform(grid, rng=rng).data, dtype=np.float32
        ),
    )
    eq = pde.PDE({"u": "laplace(u) - u**3"})
    res = eq.solve(field, t_range=0.5, dt=0.05, solver="etdrk4", tracker=None)
    assert np.asarray(res.data).dtype == np.float32
    assert np.all(np.isfinite(np.asarray(res.data)))


@pytest.mark.parametrize(
    "make_eq",
    [
        lambda: pde.DiffusionPDE(0.1),
        lambda: pde.CahnHilliardPDE(),
        lambda: pde.AllenCahnPDE(),
        lambda: pde.SwiftHohenbergPDE(),
        lambda: pde.KuramotoSivashinskyPDE(),
        lambda: pde.KPZInterfacePDE(noise=0),
    ],
    ids=["diffusion", "cahn-hilliard", "allen-cahn", "swift-hohenberg",
         "kuramoto-sivashinsky", "kpz"],
)
def test_predefined_models(make_eq, rng):
    """Every predefined scalar model exposes the spectral split and matches
    an RK4 reference at 100x the step size."""
    grid = pde.UnitGrid([32, 32], periodic=True)
    field = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = make_eq()
    res = eq.solve(field, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None)
    ref = eq.solve(field, t_range=0.1, dt=1e-4, solver="runge-kutta",
                   adaptive=False, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=1e-6
    )


def test_predefined_sde_rejected():
    """Noisy predefined models give a clean deterministic-only error."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
    with pytest.raises((RuntimeError, NotImplementedError), match="deterministic"):
        pde.KPZInterfacePDE(noise=0.1).solve(
            field, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None
        )


def test_anti_periodic_bc_rejected(rng):
    """Regression: anti-periodic laplace BCs must NOT silently receive the
    plain-periodic rfft symbol (measured 37% relative error before the
    guard); the split raises instead."""
    grid = pde.UnitGrid([32], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u)"}, bc="anti-periodic")
    with pytest.raises(NotImplementedError, match="periodic"):
        eq.solve(field, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None)


def test_three_dimensional(rng):
    """The spectral split and step are dimension-generic (rfftn over all
    grid axes)."""
    grid = pde.UnitGrid([16, 16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "laplace(u) - u**3"})
    res = eq.solve(field, t_range=0.2, dt=0.02, solver="etdrk4", tracker=None)
    ref = eq.solve(field, t_range=0.2, dt=1e-4, solver="runge-kutta",
                   adaptive=False, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=1e-6
    )


def test_complex_state_rejected():
    """Complex fields (Schrödinger-type) error cleanly — rfft is real-only."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)], (32,), periodic=True)
    field = pde.ScalarField(grid, data=np.exp(1j * np.arange(32) * 0.1))
    eq = pde.PDE({"u": "1j * laplace(u)"})
    with pytest.raises(NotImplementedError, match="complex"):
        eq.solve(field, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None)


def test_linear_split_machinery():
    """Unit-level contracts of the symbolic linear/nonlinear split."""
    import sympy

    from pde_tpu.models.pde import PDE

    u, q = sympy.Symbol("u"), sympy.Symbol("q")
    lap = sympy.Function("laplace")

    # distribution over sums and constant pull-out (incl. nesting)
    expr = lap(u**3 - u - 2 * lap(u))
    out = PDE._distribute_linear_ops(expr)
    assert out == lap(u**3) - lap(u) - 2 * lap(lap(u))

    # linear terms map to (-q^2)^m chains
    assert PDE._linear_term_symbol(3 * u, u, q) == 3
    assert PDE._linear_term_symbol(-lap(u), u, q) == q**2
    assert PDE._linear_term_symbol(2 * lap(lap(u)), u, q) == 2 * q**4
    # nonlinear / non-laplace / u-free terms stay in the remainder
    assert PDE._linear_term_symbol(lap(u**3), u, q) is None
    assert PDE._linear_term_symbol(u**2, u, q) is None
    assert PDE._linear_term_symbol(sympy.Integer(1), u, q) is None
    assert PDE._linear_term_symbol(u * lap(u), u, q) is None


def test_split_symbol_values(rng):
    """L_vals equals the summed discrete eigenvalue chains; the remainder
    reproduces rhs - L u."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
    L_vals, n_rhs = eq.make_etdrk_parts(field)

    from pde_tpu.ops.common import laplace_eigenvalues_1d

    lam = (
        laplace_eigenvalues_1d(16, 1.0)[:, None]
        + laplace_eigenvalues_1d(16, 1.0, real_half=True)[None, :]
    )
    np.testing.assert_allclose(L_vals, -lam - lam**2, rtol=1e-12)

    # remainder == full rhs - linear part (checked in real space)
    full_rhs = eq.make_pde_rhs(field)
    (full,) = full_rhs([np.asarray(field.data)], 0.0)
    (rest,) = n_rhs([np.asarray(field.data)], 0.0)
    lin_expected = np.fft.irfftn(
        L_vals * np.fft.rfftn(np.asarray(field.data)), s=(16, 16), axes=(0, 1)
    )
    np.testing.assert_allclose(
        np.asarray(rest) + lin_expected, np.asarray(full), atol=1e-10
    )


def test_bc_lap_mismatch_rejected():
    """A distinct bc_lap must not be silently dropped by the spectral split
    (the rhs expression routes one bc to every operator)."""
    grid = pde.UnitGrid([32], periodic=True)
    for eq in (
        pde.KuramotoSivashinskyPDE(bc="periodic", bc_lap={"value": 0}),
        pde.SwiftHohenbergPDE(bc="periodic", bc_lap={"value": 0}),
    ):
        field = pde.ScalarField(grid, 0.1)
        with pytest.raises(NotImplementedError):
            eq.make_etdrk_parts(field)


def test_scalar_consts_enter_linear_part():
    """`D*laplace(c)` with consts={'D': ...} must land in the exponential
    linear part, not the explicit remainder."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)], (64,), periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x)")
    eq = pde.PDE({"c": "D * laplace(c)"}, consts={"D": 0.7})
    L_vals, nonlinear_rhs = eq.make_etdrk_parts(field)
    dx = 2 * np.pi / 64
    lam1 = -(4 / dx**2) * np.sin(dx / 2) ** 2
    np.testing.assert_allclose(L_vals[1], 0.7 * lam1, rtol=1e-12)
    # the remainder must be identically zero
    (rest,) = nonlinear_rhs([field.data], 0.0)
    np.testing.assert_allclose(np.asarray(rest), 0.0, atol=1e-14)
    # and the solve is then exact at a huge dt
    res = eq.solve(field, t_range=1.0, dt=0.5, solver="etdrk4", tracker=None)
    exact = np.asarray(field.data) * np.exp(0.7 * lam1 * 1.0)
    np.testing.assert_allclose(np.asarray(res.data), exact, atol=1e-12)
