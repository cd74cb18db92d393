"""3D Pallas kernel correctness in interpreter mode (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.ops.pallas_cartesian import (
    _pick_band_k_3d,
    supports_affine_laplace_3d,
)


def test_supports_3d():
    # CPU backend → unsupported for compiled mode
    grid = pde.UnitGrid([32, 32, 128], periodic=True)
    assert not supports_affine_laplace_3d(grid, np.float32)
    # band/k selection by plane size
    assert _pick_band_k_3d((128, 128, 128), 4) == (8, 4)
    assert _pick_band_k_3d((256, 256, 256), 4) == (8, 2)  # k-plane halos freed VMEM
    assert _pick_band_k_3d((512, 512, 512), 4) is None
    # fallback path still runs (generic XLA lowering)
    state = pde.ScalarField.random_uniform(
        grid, rng=np.random.default_rng(0), dtype=jnp.float32
    )
    eq = pde.DiffusionPDE(0.1)
    solver = pde.solvers.EulerSolver(eq, adaptive=False)
    stepper = solver.make_stepper(state, dt=0.05)
    out, t = stepper(state, 0.0, 0.25)
    assert solver.info.get("fused_step") is None
    assert np.all(np.isfinite(np.asarray(out.data)))


@pytest.mark.parametrize(
    "bc",
    [
        {"derivative": 0},
        {"x": {"value": 1}, "y": {"derivative": 0.5}, "z": "periodic"},
        {"x": "periodic", "y": {"curvature": 0}, "z": {"value": 0.5}},
    ],
    ids=["noflux", "mixed-xy", "mixed-yz"],
)
def test_affine_laplace_3d_bc_interpret(bc, rng):
    """Const-affine BCs in the 3D fused kernel match the XLA path."""
    from pde_tpu.ops.pallas_cartesian import make_affine_laplace_3d

    periodic = [bc.get(ax) == "periodic" for ax in "xyz"]
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=periodic)
    bcs = grid.get_boundary_conditions(bc)
    data = jnp.asarray(rng.random((16, 8, 8)), dtype=jnp.float64)
    kernel, k = make_affine_laplace_3d(
        grid, a=1.0, b=1e-4, k=4, dtype=jnp.float64, bcs=bcs, interpret=True
    )
    out = kernel(data)
    lap = grid.make_operator("laplace", bc=bc)
    ref = data
    for _ in range(4):
        ref = ref + 1e-4 * lap(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12,
                               atol=1e-12)


def test_fused_euler_window_3d_bc_solver_path(rng, monkeypatch):
    """3D DiffusionPDE with no-flux BCs hits the fused path end-to-end."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.05, bc={"derivative": 0})

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=1e-4)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=1e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )
    assert float(res.integral) == pytest.approx(float(state.integral), rel=1e-9)
