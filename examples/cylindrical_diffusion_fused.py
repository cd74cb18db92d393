"""Diffusion on a cylindrical grid with the fused TPU kernel.

CylindricalSymGrid Laplacians lower to the temporal-blocking Pallas kernel:
the ``(1/r) d/dr`` term becomes per-row in-kernel coefficients (rows = r,
lanes = z), reaching 8.8e10 cell-updates/s on one v5e chip — 1.65x the XLA
lowering (docs/BENCHMARKS.md). On non-TPU backends the same script runs via
the XLA path. No reference analogue: py-pde compiles these loops with numba
but has no temporal-blocked equivalent (`operators/cylindrical_sym.py:32`).
"""

import numpy as np

import pde_tpu as pde
from pde_tpu.solvers import Controller, EulerSolver

grid = pde.CylindricalSymGrid(radius=1.0, bounds_z=(0, 2), shape=(256, 256))
state = pde.ScalarField.from_expression(grid, "exp(-30 * ((r - 0.5)**2 + (z - 1)**2))")

eq = pde.DiffusionPDE(diffusivity=0.1, bc={"r": {"derivative": 0}, "z": {"derivative": 0}})
solver = EulerSolver(eq)
result = Controller(solver, t_range=0.1, tracker=None).run(state, dt=1e-5)

print("fused kernel:", solver.info.get("fused_step", False))
print("mass conserved:", np.isclose(float(result.integral), float(state.integral), rtol=1e-5))
result.plot(title="diffused ring")
