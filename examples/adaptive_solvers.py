"""Adaptive time stepping with embedded Runge-Kutta (RK45).

The solver adjusts dt from the local error estimate; the dt statistics are
accumulated on device. Reference: adaptive solvers in
`/root/reference/pde/solvers/base.py:335`.
"""

import numpy as np

import pde_tpu as pde

grid = pde.UnitGrid([32, 32], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(4))
eq = pde.AllenCahnPDE(interface_width=2.0)

result, info = eq.solve(
    state, t_range=5, dt=1e-3, solver="runge-kutta", adaptive=True,
    tolerance=1e-4, tracker=None, ret_info=True,
)
stats = info["solver"]["dt_statistics"]
print("accepted steps:", info["solver"]["steps"])
print(f"dt range: [{stats.min:.2e}, {stats.max:.2e}], mean {stats.mean:.2e}")
result.plot(title="Allen-Cahn via adaptive RK45")
