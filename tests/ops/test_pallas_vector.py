"""Vector-state expression PDEs through the fused multi-field windows.

Rank-1 states lower as component planes (round-4, VERDICT #10): the
reference's rank-generic native operators
(`/root/reference/pde/backends/numba/operators/cartesian.py:962-1076`) run
vector states through the same compiled loops as scalars; here a
VectorField occupies ``grid.dim`` consecutive planes of the multi-field
kernel and `_wrap_vector_planes` adapts the stacked leaf layout. Interpret
mode on CPU (fp64) — parity against the XLA lowering must be exact.
"""

import numpy as np
import pytest

import pde_tpu as pde


def _pair(eq, state, solver_cls, t_range, dt, monkeypatch, expect_fused=True,
          **solver_kw):
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    solver = solver_cls(eq, **solver_kw)
    res, _ = solver.make_stepper(state, dt=dt)(state, 0.0, t_range)
    assert solver.info.get("fused_step", False) is expect_fused
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref_solver = solver_cls(eq, **solver_kw)
    ref, _ = ref_solver.make_stepper(state, dt=dt)(state, 0.0, t_range)
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED")
    return res, ref, solver.info


def _assert_equal(res, ref):
    for a, b in zip(
        res if isinstance(res, pde.FieldCollection) else [res],
        ref if isinstance(ref, pde.FieldCollection) else [ref],
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.data), rtol=1e-12, atol=1e-13
        )


def test_vector_state_fuses_2d(rng, monkeypatch):
    """vector_laplace + dot on a VectorField state (Ginzburg-Landau-like)."""
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.VectorField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "0.1 * vector_laplace(u) + u - dot(u, u) * u"})
    res, ref, _ = _pair(eq, state, EulerSolver, 0.05, 1e-3, monkeypatch)
    _assert_equal(res, ref)


def test_vector_state_fuses_3d(rng, monkeypatch):
    """3D vector state: 3 component planes through the volume kernel."""
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.UnitGrid([8, 8, 8], periodic=True)
    state = pde.VectorField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "0.05 * vector_laplace(u) - dot(u, u) * u"})
    res, ref, _ = _pair(eq, state, EulerSolver, 0.02, 1e-3, monkeypatch)
    _assert_equal(res, ref)


def test_vector_state_fuses_rk4(rng, monkeypatch):
    """All four RK4 stages advance the component planes consistently."""
    from pde_tpu.solvers.runge_kutta import RungeKuttaSolver

    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.VectorField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "0.1 * vector_laplace(u) - dot(u, u) * u"})
    res, ref, _ = _pair(
        eq, state, RungeKuttaSolver, 0.02, 1e-3, monkeypatch, adaptive=False
    )
    _assert_equal(res, ref)


def test_coupled_scalar_vector_collection(rng, monkeypatch):
    """FieldCollection mixing ranks: divergence couples the vector into the
    scalar's rhs, gradient couples the scalar back into the vector's."""
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.UnitGrid([16, 16], periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.VectorField.random_uniform(grid, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({
        "u": "0.1 * laplace(u) - divergence(v)",
        "v": "0.05 * vector_laplace(v) + gradient(u) - dot(v, v) * v",
    })
    res, ref, _ = _pair(eq, state, EulerSolver, 0.05, 5e-3, monkeypatch)
    _assert_equal(res, ref)


def test_vector_state_scalar_bcs(rng, monkeypatch):
    """Scalar-valued physical BCs apply identically to every component."""
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.UnitGrid([16, 16])
    state = pde.VectorField.random_uniform(grid, rng=rng)
    eq = pde.PDE(
        {"u": "0.05 * vector_laplace(u)"},
        bc={"x": {"value": 0.5}, "y": {"derivative": 0}},
    )
    res, ref, _ = _pair(eq, state, EulerSolver, 0.02, 1e-3, monkeypatch)
    _assert_equal(res, ref)


def test_vector_state_scalar_rhs_broadcasts(rng, monkeypatch):
    """A scalar-valued rhs for a vector variable replicates across the
    components, matching the XLA path's broadcast to the field shape."""
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.UnitGrid([16, 16], periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.VectorField.random_uniform(grid, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({
        "u": "0.1 * laplace(u)",
        "v": "divergence(gradient(u)) - dot(v, v)",  # scalar expression
    })
    res, ref, _ = _pair(eq, state, EulerSolver, 0.02, 1e-3, monkeypatch)
    _assert_equal(res, ref)


def test_vector_gates_fall_back(rng, monkeypatch):
    """Unsupported vector configurations report a reason and take XLA."""
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.VectorField.random_uniform(grid, rng=rng)

    # noise on a vector state
    eq_sde = pde.PDE({"u": "0.1 * vector_laplace(u)"}, noise=0.1)
    s = EulerSolver(eq_sde)
    out, _ = s.make_stepper(state, dt=1e-3)(state, 0.0, 0.01)
    assert s.info.get("fused_step") is None
    assert "noise" in s.info.get("fused_unsupported", "")
    assert np.isfinite(np.asarray(out.data)).all()

    # per-boundary-point array values are ambiguous on vector states
    grid_n = pde.UnitGrid([16, 16])
    state_n = pde.VectorField.random_uniform(grid_n, rng=rng)
    eq_arr = pde.PDE(
        {"u": "0.05 * vector_laplace(u)"},
        bc={"x-": {"value": np.linspace(0, 1, 16)}, "x+": {"derivative": 0},
            "y": {"derivative": 0}},
    )
    s2 = EulerSolver(eq_arr)
    out2, _ = s2.make_stepper(state_n, dt=1e-3)(state_n, 0.0, 0.01)
    assert s2.info.get("fused_step") is None
    assert "scalar BC values" in s2.info.get("fused_unsupported", "")
    assert np.isfinite(np.asarray(out2.data)).all()

    # `laplace` on a vector argument names the reference's operator
    eq_bad = pde.PDE({"u": "laplace(u)"})
    s3 = EulerSolver(eq_bad)
    with pytest.raises(Exception):
        # the XLA path cannot lower it either: unsupported configuration
        s3.make_stepper(state, dt=1e-3)(state, 0.0, 0.01)
    assert "vector_laplace" in s3.info.get("fused_unsupported", "")


def test_vector_state_decomposed_falls_back(rng, monkeypatch):
    """Sharded runs with vector states take the XLA sharded path (the
    halo-extended kernels only move scalar planes)."""
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([16, 16], periodic=True)
    state = pde.VectorField.random_uniform(grid, rng=rng)
    eq = pde.PDE({"u": "0.1 * vector_laplace(u) - dot(u, u) * u"})
    solver = EulerSolver(eq, decomposition=[2, 1])
    res, _ = solver.make_stepper(state, dt=1e-3)(state, 0.0, 0.01)
    assert solver.info.get("fused_step") is None
    assert "scalar fields" in solver.info.get("fused_unsupported", "")
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref_solver = EulerSolver(eq)
    ref, _ = ref_solver.make_stepper(state, dt=1e-3)(state, 0.0, 0.01)
    np.testing.assert_array_equal(np.asarray(res.data), np.asarray(ref.data))
