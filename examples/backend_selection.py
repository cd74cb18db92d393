"""Selecting a compute backend: jax (default), pallas, numpy.

The reference dispatches between six engines (numpy/numba/.../torch,
`/root/reference/pde/backends/registry.py:278`); pde_tpu exposes its three
genuinely distinct engines the same way:

- ``backend="jax"`` (default): XLA-compiled steppers that auto-select the
  fused Pallas window when the configuration supports it.
- ``backend="pallas"``: the fused Pallas window becomes a *guarantee* —
  configurations without a kernel path raise instead of silently falling
  back to XLA.
- ``backend="numpy"``: eager Python step loops without `jax.jit` — the
  debug engine; breakpoints and prints work inside `evolution_rate`.
"""

import os

import numpy as np

import pde_tpu as pde

# interpret mode lets the Pallas kernels run on CPU for this demo
os.environ.setdefault("PDE_TPU_PALLAS_INTERPRET", "1")

grid = pde.UnitGrid([32, 32], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
eq = pde.DiffusionPDE(0.1)

results = {}
for backend in ["jax", "pallas", "numpy"]:
    result, info = eq.solve(
        state, t_range=0.1, dt=1e-2, backend=backend, tracker=None,
        ret_info=True,
    )
    results[backend] = result
    print(
        f"backend={backend:7s} fused_step={info['solver'].get('fused_step')} "
        f"average={float(result.average):.6f}"
    )

# all engines integrate the same equation
for backend, result in results.items():
    np.testing.assert_allclose(
        np.asarray(result.data), np.asarray(results["jax"].data),
        rtol=1e-5, atol=1e-8,
    )
print("all backends agree")

# the pallas backend refuses configurations without a kernel path
try:
    eq.solve(
        pde.ScalarField.random_uniform(pde.UnitGrid([32], periodic=True)),
        t_range=0.1, dt=1e-2, backend="pallas", tracker=None,
    )
except RuntimeError as err:
    print("pallas on a 1D grid:", err)
