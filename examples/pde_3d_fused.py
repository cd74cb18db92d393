"""3D expression PDE through the fused Pallas volume kernel.

Arbitrary rhs trees over laplace/gradient/divergence/gradient_squared/dot on
3D Cartesian grids lower into one temporal-blocking volume kernel (bands
over x, in-register y/z neighborhoods) — measured 5.1x the XLA lowering at
256^3 on one TPU chip (docs/BENCHMARKS.md). With ``decomposition=`` the same
trees run on a device mesh with ppermute halo exchange once per k-step
kernel call.
"""

import pde_tpu as pde
from pde_tpu.solvers.controller import Controller
from pde_tpu.solvers.euler import EulerSolver

grid = pde.CartesianGrid([(0, 1)] * 3, (32, 16, 16), periodic=True)
state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, label="c")

# 3D Allen-Cahn as an expression PDE
eq = pde.PDE({"c": "0.1 * laplace(c) + c - c**3"})

solver = EulerSolver(eq)
result = Controller(solver, t_range=0.1, tracker=None).run(state, dt=1e-3)

print("fused volume kernel used:", solver.info.get("fused_step", False))
print("final fluctuation:", float(result.fluctuations))
