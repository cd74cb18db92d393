"""End-to-end integration tests coupling PDEs, solvers, storage, and trackers.

Mirrors the reference `tests/test_integration.py`.
"""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.utils.config import config


def test_complex_schroedinger():
    """Free Schrödinger equation: complex fields through the full stack."""
    grid = pde.CartesianGrid([(0, 2 * np.pi)], 64, periodic=True)
    psi0 = pde.ScalarField.from_expression(grid, "exp(1j * x)", dtype=complex)
    eq = pde.PDE({"psi": "I * laplace(psi)"})
    assert eq.complex_valued
    result = eq.solve(psi0, t_range=0.5, dt=1e-4, tracker=None)
    # exp(i x) is an eigenfunction: psi(t) = exp(i x - i t) up to discretization
    norm0 = float(psi0.to_scalar("norm_squared").integral)
    norm1 = float(result.to_scalar("norm_squared").integral)
    assert norm1 == pytest.approx(norm0, rel=1e-3)
    assert np.iscomplexobj(np.asarray(result.data))


def test_vector_variable_expression_pde(rng):
    """Expression PDEs support vector-field variables with vector operators."""
    grid = pde.UnitGrid([16, 16], periodic=True)
    v0 = pde.VectorField.random_uniform(grid, -0.1, 0.1, rng=rng)
    eq = pde.PDE({"v": "vector_laplace(v)"})
    rate = eq.evolution_rate(v0)
    expected = v0.laplace("auto_periodic_neumann")
    np.testing.assert_allclose(
        np.asarray(rate.data), np.asarray(expected.data), atol=1e-12
    )
    result = eq.solve(v0, t_range=0.2, dt=0.01, tracker=None)
    assert isinstance(result, pde.VectorField)
    assert float(result.to_scalar("norm").average) < float(
        v0.to_scalar("norm").average
    )


def test_3d_diffusion(rng):
    grid = pde.UnitGrid([8, 8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(diffusivity=0.2)
    result = eq.solve(state, t_range=1, dt=0.01, tracker=None)
    assert float(result.integral) == pytest.approx(float(state.integral))
    assert float(result.fluctuations) < float(state.fluctuations)


def test_heterogeneous_bc_array():
    """Boundary values can be arrays matching the boundary shape."""
    grid = pde.UnitGrid([4, 4])
    values = np.linspace(0, 1, 4)
    bcs = grid.get_boundary_conditions(
        {"x": {"derivative": 0}, "y-": {"value": values}, "y+": {"derivative": 0}}
    )
    field = pde.ScalarField(grid, 0.0)
    full = np.asarray(field.get_full_data(bcs))
    np.testing.assert_allclose(full[1:-1, 0], 2 * values)


def test_time_dependent_bc_solve():
    """Expression BCs receive the simulation time during stepping."""
    grid = pde.CartesianGrid([(0, 1)], 16)
    state = pde.ScalarField(grid, 0.0)
    eq = pde.DiffusionPDE(
        diffusivity=1.0,
        bc={"x-": {"value": 0}, "x+": {"value_expression": "t / (t + 1)"}},
    )
    result = eq.solve(state, t_range=5, dt=1e-4, tracker=None)
    # long-time limit: boundary value ~ 5/6, linear profile
    expected = grid.axes_coords[0] * (5 / 6)
    np.testing.assert_allclose(np.asarray(result.data), expected, atol=0.05)


def test_expression_pde_post_step_hook(rng):
    grid = pde.UnitGrid([8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, 1.5, 2.0, rng=rng)

    def clip_hook(data, t):
        import jax.numpy as jnp

        return jnp.minimum(data, 1.0)

    eq = pde.PDE({"c": "0.1 * laplace(c)"}, post_step_hook=clip_hook)
    result = eq.solve(state, t_range=0.2, dt=0.01, tracker=None)
    assert float(result.data.max()) <= 1.0


def test_config_context_affects_solve(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE()
    base = eq.solve(state, t_range=0.1, dt=0.01, tracker=None)
    with config({"operators.cartesian.laplacian_2d_corner_weight": 1 / 3}):
        nine_point = eq.solve(state, t_range=0.1, dt=0.01, tracker=None)
    assert not np.allclose(np.asarray(base.data), np.asarray(nine_point.data))


def test_solve_with_storage_and_adaptive(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.SwiftHohenbergPDE(rate=0.1)
    storage = pde.MemoryStorage()
    result, info = eq.solve(
        state, t_range=2, solver="runge-kutta", adaptive=True, tolerance=1e-6,
        tracker=[storage.tracker(0.5), "consistency"], ret_info=True,
    )
    assert len(storage) == 5
    assert info["solver"]["dt_statistics"].count > 0
    assert np.all(np.isfinite(np.asarray(result.data)))


def test_wave_mixed_bcs_adaptive_rk45(rng):
    """BASELINE config 3: WavePDE with mixed periodic/Dirichlet/Neumann BCs
    solved with adaptive RK45."""
    grid = pde.UnitGrid([16, 16], periodic=[True, False])
    bc = {"x": "periodic", "y-": {"value": 0}, "y+": {"derivative": 0}}
    eq = pde.WavePDE(speed=1, bc=bc)
    u0 = pde.ScalarField.from_expression(
        pde.CartesianGrid([(0, 16), (0, 16)], (16, 16), periodic=[True, False]),
        "exp(-((x-8)**2 + (y-8)**2))",
    )
    u0 = pde.ScalarField(grid, u0.data)
    init = eq.get_initial_condition(u0)
    result, info = eq.solve(
        state=init, t_range=1, solver="runge-kutta", adaptive=True,
        tolerance=1e-6, tracker=None, ret_info=True,
    )
    assert np.all(np.isfinite(np.asarray(result[0].data)))
    # match a fine fixed-dt reference
    ref = eq.solve(init, t_range=1, dt=1e-3, solver="runge-kutta", tracker=None)
    np.testing.assert_allclose(
        np.asarray(result[0].data), np.asarray(ref[0].data), atol=1e-4
    )


def test_swift_hohenberg_mixed_bcs_adaptive(rng):
    """BASELINE config 3 (variant): SwiftHohenberg with mixed BCs + RK45."""
    grid = pde.UnitGrid([12, 12], periodic=[True, False])
    bc = {"x": "periodic", "y-": {"value": 0}, "y+": {"derivative": 0}}
    eq = pde.SwiftHohenbergPDE(rate=0.1, bc=bc)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)
    result = eq.solve(state, t_range=1, solver="runge-kutta", adaptive=True,
                      tolerance=1e-6, tracker=None)
    assert np.all(np.isfinite(np.asarray(result.data)))


def test_field_split_mpi(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    sharded = field.split_mpi("auto")
    np.testing.assert_allclose(np.asarray(sharded.data), np.asarray(field.data))


def test_restart_from_storage(rng):
    """Any stored state can re-seed solve() (checkpoint/resume primitive)."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE()
    storage = pde.MemoryStorage()
    eq.solve(state, t_range=1, dt=0.01, tracker=storage.tracker(0.5))
    # restart from the middle snapshot
    intermediate = storage[1]
    resumed = eq.solve(intermediate, t_range=(0.5, 1.0), dt=0.01, tracker=None)
    direct = eq.solve(state, t_range=1, dt=0.01, tracker=None)
    np.testing.assert_allclose(
        np.asarray(resumed.data), np.asarray(direct.data), atol=1e-12
    )


def test_evolution_rate_out_kwarg_compat(rng):
    """apply_operator's out= argument updates in place (API compatibility)."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    out = pde.ScalarField(grid)
    result = field.laplace("periodic", out=out)
    assert result is out
    np.testing.assert_allclose(
        np.asarray(out.data), np.asarray(field.laplace("periodic").data)
    )


# -- round-2 end-to-end flows ------------------------------------------------------------


def test_full_pipeline_storage_trackers_sharded(rng, tmp_path):
    """PDE + sharded solver + file storage + data tracker, end to end."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    from pde_tpu.storage import FileStorage

    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = FileStorage(str(tmp_path / "run.h5"))
    data_tracker = pde.DataTracker(lambda s, t: float(s.average), interrupts=0.1)
    eq = pde.DiffusionPDE(0.3)
    result, info = eq.solve(
        state, t_range=0.3, dt=0.01, solver="explicit_sharded", adaptive=False,
        decomposition=[2, 2],
        tracker=[storage.tracker(0.1), data_tracker], ret_info=True,
    )
    storage.close()
    assert len(storage) == 4
    # mass conserved and recorded identically by the tracker
    avgs = data_tracker.data
    np.testing.assert_allclose(avgs, avgs[0], rtol=1e-10)
    assert info["controller"]["successful"]


def test_resume_from_file_storage(rng, tmp_path):
    """Checkpoint/resume: a run continued from storage matches a single run."""
    from pde_tpu.storage import FileStorage

    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.2)

    full = eq.solve(state, t_range=0.2, dt=0.01, tracker=None)

    path = tmp_path / "ckpt.h5"
    storage = FileStorage(str(path))
    eq.solve(state, t_range=0.1, dt=0.01, tracker=storage.tracker(0.1))
    storage.close()
    reader = FileStorage(str(path), write_mode="read_only")
    checkpoint = reader[-1]
    reader.close()
    resumed = eq.solve(checkpoint, t_range=(0.1, 0.2), dt=0.01, tracker=None)
    np.testing.assert_allclose(
        np.asarray(resumed.data), np.asarray(full.data), rtol=1e-12, atol=1e-13
    )


def test_expression_pde_full_stack_with_movie(rng, tmp_path):
    """Expression PDE + movie storage + steady-state stop."""
    from pde_tpu.storage.movie import MovieStorage

    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, 0.4, 0.6, rng=rng, label="c")
    eq = pde.PDE({"c": "2.0 * laplace(c)"})
    movie = MovieStorage(str(tmp_path / "m.avi"), vmin=0, vmax=1)
    result, info = eq.solve(
        state, t_range=50, dt=0.01,
        tracker=[movie.tracker(1.0), "steady_state"], ret_info=True,
    )
    assert info["controller"]["t_final"] < 50  # steady state reached early
    assert len(movie) >= 2


def test_sde_reproducibility_with_seeds(rng):
    """Stochastic runs are exactly reproducible given the same seed."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField(grid, data=0.0)

    def run(seed):
        eq = pde.DiffusionPDE(0.1, noise=0.5, rng=np.random.default_rng(seed))
        return np.asarray(eq.solve(state, t_range=0.1, dt=0.01,
                                   tracker=None).data)

    a, b, c = run(7), run(7), run(8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_post_step_hook_with_adaptive_solver(rng):
    """Post-step hooks compose with the adaptive while_loop."""
    import jax.numpy as jnp

    class Clamped(pde.DiffusionPDE):
        def make_post_step_hook(self, state):
            def hook(leaves, t, data):
                new = [jnp.clip(y, -0.2, 0.2) for y in leaves]
                return new, data + sum(
                    jnp.sum(o != n) for o, n in zip(leaves, new)
                )

            return hook, 0.0

    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, -1, 1, rng=rng)
    eq = Clamped(1.0)
    result, info = eq.solve(
        state, t_range=0.2, dt=1e-3, solver="runge-kutta", adaptive=True,
        tolerance=1e-5, tracker=None, ret_info=True,
    )
    assert float(np.abs(np.asarray(result.data)).max()) <= 0.2 + 1e-12
    assert info["solver"]["post_step_data"] > 0
