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


def test_corner_weight_diffusion_exact():
    """ETDRK4 honors the configured 9-point corner-weight Laplacian.

    The 9-pt stencil is A⊗I + I⊗B + c·A⊗B over the per-axis second
    differences, so each Fourier mode decays with the exact eigenvalue
    a·λx + b·λy + c·λx·λy; the formula is cross-checked against the
    real-space stencil before the decay assertion.
    """
    grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, (32, 32), periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x) * cos(2*y)")
    eq = pde.PDE({"u": "0.3 * laplace(u)"})
    w = 0.5
    with pde.config({"operators.cartesian.laplacian_2d_corner_weight": w}):
        res = eq.solve(field, t_range=1.0, dt=0.5, solver="etdrk4", tracker=None)
        lap = field.laplace("periodic")
    dx = 2 * np.pi / 32
    lx = -(4 / dx**2) * np.sin(1 * dx / 2) ** 2
    ly = -(4 / dx**2) * np.sin(2 * dx / 2) ** 2
    s = dx**-2
    a = (1 - w) + 2 * s * w / (2 * s)  # isotropic grid: a = b = 1
    c = 2 * s * w / (4 * s * s)
    lam9 = a * lx + a * ly + c * lx * ly
    np.testing.assert_allclose(
        np.asarray(lap.data), lam9 * np.asarray(field.data), atol=1e-10
    )
    exact = np.asarray(field.data) * np.exp(0.3 * lam9 * 1.0)
    np.testing.assert_allclose(np.asarray(res.data), exact, atol=1e-12)


def test_corner_weight_nonperiodic_raises(rng):
    """Corner-ghost extrapolation on physical boundaries is not an exact
    tensor-product operator -> clean NotImplementedError, no silent 5-pt."""
    grid = pde.UnitGrid([16, 16])
    field = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"u": "laplace(u)"})
    with pde.config({"operators.cartesian.laplacian_2d_corner_weight": 0.5}):
        with pytest.raises(NotImplementedError, match="corner-weight"):
            eq.solve(field, t_range=0.1, dt=0.05, solver="etdrk4", tracker=None)


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
    # BC types without a diagonalizing modal basis fall back cleanly
    npgrid = pde.UnitGrid([16, 16])
    npfield = pde.ScalarField.random_uniform(npgrid, rng=rng)
    for bad_bc in (
        {"x": {"derivative": 0}, "y": {"mixed": 1.0}},  # Robin
        {"x": {"value": 1.0}, "y": {"derivative": 0}},  # inhomogeneous value
        {"x-": {"value": 0}, "x+": {"derivative": 0},   # mixed per-side
         "y": {"derivative": 0}},
    ):
        with pytest.raises(NotImplementedError, match="periodic|Neumann|Dirichlet"):
            pde.PDE({"u": "laplace(u)"}, bc=bad_bc).solve(
                npfield, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None
            )
    # coupled fields must share the laplace BC types
    coll = pde.FieldCollection(
        [pde.ScalarField.random_uniform(npgrid, rng=rng, label=k) for k in "uv"]
    )
    with pytest.raises(NotImplementedError, match="share"):
        pde.PDE(
            {"u": "laplace(u)", "v": "laplace(v)"},
            bc={"derivative": 0},
            bc_ops={"v:laplace": {"value": 0}},
        ).solve(coll, t_range=0.1, dt=0.01, solver="etdrk4", tracker=None)
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


# -- round-3 generalization: non-periodic axes (DCT/DST) and coupled systems -------


def test_neumann_diffusion_exact():
    """No-flux axes go through DCT-II modes: pure-linear diffusion is exact
    at any dt (each cos mode decays with its ghost-cell FD eigenvalue)."""
    n = 32
    grid = pde.CartesianGrid([(0, 1)] * 2, (n, n))
    x = (np.arange(n) + 0.5) / n
    data = np.cos(2 * np.pi * x)[:, None] * np.cos(3 * np.pi * x)[None, :]
    field = pde.ScalarField(grid, data)
    eq = pde.PDE({"u": "0.01 * laplace(u)"}, bc={"derivative": 0})
    res = eq.solve(field, t_range=1.0, dt=0.5, solver="etdrk4", tracker=None)
    dx = 1.0 / n
    lam = -(4 / dx**2) * (
        np.sin(np.pi * 2 / (2 * n)) ** 2 + np.sin(np.pi * 3 / (2 * n)) ** 2
    )
    exact = data * np.exp(0.01 * lam)
    np.testing.assert_allclose(np.asarray(res.data), exact, atol=1e-11)


def test_dirichlet_diffusion_exact():
    """Homogeneous-Dirichlet axes go through DST-II modes."""
    n = 24
    grid = pde.CartesianGrid([(0, 2)], (n,))
    x = (np.arange(n) + 0.5) / n
    data = np.sin(np.pi * x) + 0.3 * np.sin(4 * np.pi * x)
    field = pde.ScalarField(grid, data)
    eq = pde.PDE({"u": "0.05 * laplace(u)"}, bc={"value": 0})
    res = eq.solve(field, t_range=2.0, dt=1.0, solver="etdrk4", tracker=None)
    dx = 2.0 / n
    lam1 = -(4 / dx**2) * np.sin(np.pi * 1 / (2 * n)) ** 2
    lam4 = -(4 / dx**2) * np.sin(np.pi * 4 / (2 * n)) ** 2
    exact = np.sin(np.pi * x) * np.exp(0.05 * lam1 * 2.0) + 0.3 * np.sin(
        4 * np.pi * x
    ) * np.exp(0.05 * lam4 * 2.0)
    np.testing.assert_allclose(np.asarray(res.data), exact, atol=1e-11)


@pytest.mark.parametrize(
    "bc",
    [
        {"x": "periodic", "y": {"derivative": 0}},
        {"x": {"derivative": 0}, "y": {"value": 0}},
    ],
    ids=["mixed-periodic-neumann", "neumann-dirichlet"],
)
def test_nonperiodic_nonlinear_matches_euler(bc, rng):
    """Nonlinear problems on mixed-BC axes track a fine-dt Euler run."""
    periodic = [bc.get("x") == "periodic", bc.get("y") == "periodic"]
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (16, 16), periodic=periodic)
    field = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"u": "0.02 * laplace(u) + u - u**3"}, bc=bc)
    ref = eq.solve(field, t_range=1.0, dt=1e-4, solver="euler", tracker=None)
    res = eq.solve(field, t_range=1.0, dt=1e-2, solver="etdrk4", tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=2e-6
    )


def test_coupled_linear_rotation_exact():
    """A linearly coupled system (u_t = D∇²u + ωv, v_t = D∇²v - ωu) is
    integrated exactly by the per-mode matrix exponential at any dt."""
    n, D, w = 32, 0.2, 1.3
    grid = pde.CartesianGrid([(0, 2 * np.pi)], (n,), periodic=True)
    x = pde.ScalarField.from_expression(grid, "sin(x)")
    u0 = np.asarray(x.data)
    state = pde.FieldCollection(
        [pde.ScalarField(grid, u0, label="u"),
         pde.ScalarField(grid, 0.0, label="v")]
    )
    eq = pde.PDE({"u": f"{D} * laplace(u) + {w} * v",
                  "v": f"{D} * laplace(v) - {w} * u"})
    t_end = 1.0
    res = eq.solve(state, t_range=t_end, dt=0.5, solver="etdrk4", tracker=None)
    dx = 2 * np.pi / n
    lam = -(4 / dx**2) * np.sin(dx / 2) ** 2
    decay = np.exp(D * lam * t_end)
    np.testing.assert_allclose(
        np.asarray(res[0].data), u0 * decay * np.cos(w * t_end), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(res[1].data), -u0 * decay * np.sin(w * t_end), atol=1e-11
    )


def test_coupled_gray_scott_matches_rk4(rng):
    """Stiff coupled Gray-Scott reaction-diffusion at 100x the explicit
    step size (the VERDICT round-3 'done' example)."""
    grid = pde.UnitGrid([24, 24], periodic=True)
    u = pde.ScalarField(grid, 1.0, label="u")
    v0 = np.zeros((24, 24))
    v0[8:16, 8:16] = 0.5
    v = pde.ScalarField(grid, v0 + 0.01 * rng.random((24, 24)), label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({
        "u": "0.2 * laplace(u) - u * v**2 + 0.04 * (1 - u)",
        "v": "0.1 * laplace(v) + u * v**2 - 0.1 * v",
    })
    ref = eq.solve(state, t_range=20.0, dt=0.01, solver="runge-kutta",
                   adaptive=False, tracker=None)
    res = eq.solve(state, t_range=20.0, dt=1.0, solver="etdrk4", tracker=None)
    for a, b in zip(res, ref):
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.data), atol=2e-4
        )


def test_coupled_schnakenberg_neumann(rng):
    """Coupled system on no-flux axes: DCT modes + per-mode 2x2 matrices."""
    grid = pde.UnitGrid([16, 16])
    state = pde.FieldCollection([
        pde.ScalarField(grid, 1.0 + 0.1 * rng.random((16, 16)), label="a"),
        pde.ScalarField(grid, 0.9 + 0.1 * rng.random((16, 16)), label="b"),
    ])
    eq = pde.PDE({
        "a": "laplace(a) + 0.1 - a + a**2 * b",
        "b": "10 * laplace(b) + 0.9 - a**2 * b",
    }, bc={"derivative": 0})
    ref = eq.solve(state, t_range=0.5, dt=1e-4, solver="euler", tracker=None)
    res = eq.solve(state, t_range=0.5, dt=0.05, solver="etdrk4", tracker=None)
    for a, b in zip(res, ref):
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.data), atol=1e-4
        )


def test_coupled_split_matrix_values():
    """The coupled split produces per-mode (N, N) matrices with laplace
    chains on the diagonal and constant cross couplings."""
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.FieldCollection([
        pde.ScalarField(grid, 0.0, label="u"),
        pde.ScalarField(grid, 0.0, label="v"),
    ])
    eq = pde.PDE({"u": "2 * laplace(u) + 3 * v + u * v",
                  "v": "-laplace(laplace(v)) - 0.5 * u"})
    parts = eq.make_etdrk_parts(state)
    assert parts.n_fields == 2
    assert parts.axis_kinds == ("periodic",)
    from pde_tpu.ops.common import laplace_eigenvalues_1d

    lam = laplace_eigenvalues_1d(8, 1.0, real_half=True)
    L = parts.L_vals
    assert L.shape == (5, 2, 2)
    np.testing.assert_allclose(L[:, 0, 0], 2 * lam, rtol=1e-12)
    np.testing.assert_allclose(L[:, 0, 1], 3.0, rtol=1e-12)
    np.testing.assert_allclose(L[:, 1, 0], -0.5, rtol=1e-12)
    np.testing.assert_allclose(L[:, 1, 1], -lam**2, rtol=1e-12)
    # the u*v term stays in the remainder
    u = np.full(8, 2.0)
    v = np.full(8, 3.0)
    rest = parts.nonlinear_rhs([u, v], 0.0)
    np.testing.assert_allclose(np.asarray(rest[0]), 6.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rest[1]), 0.0, atol=1e-12)


def test_ks_neumann_convergence(rng):
    """Kuramoto-Sivashinsky (biharmonic stiffness) on a no-flux domain —
    the exponential treatment works through the DCT basis, too."""
    grid = pde.CartesianGrid([(0, 16 * np.pi)], (128,))
    x = (np.arange(128) + 0.5) / 128 * 16 * np.pi
    field = pde.ScalarField(grid, np.cos(x / 8) * (1 + np.sin(x / 8)))
    eq = pde.PDE(
        {"u": "-laplace(u) - laplace(laplace(u)) - gradient_squared(u) / 2"},
        bc={"derivative": 0},
    )
    ref = eq.solve(field, t_range=2.0, dt=1e-4, solver="runge-kutta",
                   adaptive=False, tracker=None)
    res = eq.solve(field, t_range=2.0, dt=0.02, solver="etdrk4", tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), atol=1e-4
    )


# -- decomposed (GSPMD) ETDRK4 --------------------------------------------------------


@pytest.mark.parametrize("decomposition", [[2, 1], [1, 2], [2, 2], [4, 2]])
def test_decomposed_matches_serial_periodic(decomposition, rng):
    """Decomposed ETDRK4 windows (shard_map; transform axes all_gather-ed,
    nonlinear remainder on ShardedBoundaries subgrids) stay BIT-identical
    to the serial solver — the framework's sharding invariant."""
    from pde_tpu.solvers import Controller

    grid = pde.UnitGrid([32, 32], periodic=True)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
    ref = Controller(ETDRK4Solver(eq), t_range=1.0, tracker=None).run(
        state, dt=0.05
    )
    solver = ETDRK4Solver(eq, decomposition=decomposition)
    res = Controller(solver, t_range=1.0, tracker=None).run(state, dt=0.05)
    assert solver.info.get("etdrk_sharding") == "shard_map+psum_gather"
    np.testing.assert_array_equal(np.asarray(res.data), np.asarray(ref.data))


@pytest.mark.parametrize(
    "bc, periodic",
    [
        ({"derivative": 0}, False),
        ({"value": 0}, False),
        ({"x": "periodic", "y": {"derivative": 0}}, [True, False]),
    ],
    ids=["dct", "dst", "mixed-fft-dct"],
)
def test_decomposed_matches_serial_matrix_bases(bc, periodic, rng):
    """DCT/DST matmul-basis axes gather every decomposed axis before the
    matmul (serial operand shapes — the same dot products as serial).

    Forward/inverse/rhs are each BITWISE-identical to serial in isolation
    (and a single composed step is too), but inside the window's fori_loop
    XLA:CPU selects ulp-different matmul lowerings for the two programs
    (layout-dependent gemm packing; optimization_barrier does not pin it),
    so matrix-basis axes assert a 2-ulp absolute tolerance instead of the
    bitwise identity the FFT-axis test demands."""
    from pde_tpu.solvers import Controller

    grid = pde.UnitGrid([32, 32], periodic=periodic)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"u": "0.5 * laplace(u) + u - u**3"}, bc=bc)
    ref = Controller(ETDRK4Solver(eq), t_range=1.0, tracker=None).run(
        state, dt=0.1
    )
    solver = ETDRK4Solver(eq, decomposition=[2, 2])
    res = Controller(solver, t_range=1.0, tracker=None).run(state, dt=0.1)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=0, atol=5e-16
    )


def test_decomposed_coupled_system(rng):
    """Coupled FieldCollection systems decompose too (per-mode matrix
    products shard over the mode grid)."""
    from pde_tpu.solvers import Controller

    grid = pde.UnitGrid([32, 32], periodic=True)
    u = pde.ScalarField.random_uniform(grid, 0.3, 0.7, rng=rng, label="u")
    v = pde.ScalarField.random_uniform(grid, 0.1, 0.3, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({
        "u": "0.08 * laplace(u) - u*v**2 + 0.035 * (1 - u)",
        "v": "0.04 * laplace(v) + u*v**2 - 0.1 * v",
    })
    ref = Controller(ETDRK4Solver(eq), t_range=5.0, tracker=None).run(
        state, dt=0.5
    )
    solver = ETDRK4Solver(eq, decomposition=[2, 2])
    res = Controller(solver, t_range=5.0, tracker=None).run(state, dt=0.5)
    for a, b in zip(res, ref, strict=True):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_decomposed_trackers_and_windows(rng):
    """Tracker interrupts split the run into several sharded windows; the
    stored trajectory must match the serial solver's exactly."""
    from pde_tpu.solvers import Controller
    from pde_tpu.storage.memory import MemoryStorage

    grid = pde.UnitGrid([32, 32], periodic=True)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"c": "0.1 * laplace(c) - c**3"})
    st_ref = MemoryStorage()
    Controller(
        ETDRK4Solver(eq), t_range=1.0, tracker=st_ref.tracker(0.25)
    ).run(state, dt=0.05)
    st = MemoryStorage()
    Controller(
        ETDRK4Solver(eq, decomposition=[2, 2]),
        t_range=1.0,
        tracker=st.tracker(0.25),
    ).run(state, dt=0.05)
    for a, b in zip(st, st_ref, strict=True):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
