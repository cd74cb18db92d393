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
    assert _pick_band_k_3d((256, 256, 256), 4) == (8, 1)
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
