"""Stiff coupled reaction-diffusion solved with the ETDRK4 exponential integrator.

Gray-Scott pattern formation: the diffusive linear part (a per-mode 2x2
coupling matrix in rfft space) is integrated exactly, so dt is set by the
reaction accuracy alone — orders of magnitude above the explicit stability
limit. There is no reference equivalent (py-pde hands stiff problems to
host-side scipy, `/root/reference/pde/solvers/scipy.py:17`).
"""

import numpy as np

import pde_tpu as pde

grid = pde.UnitGrid([64, 64], periodic=True)
rng = np.random.default_rng(12)
u = pde.ScalarField(grid, 1.0, label="u")
v_data = np.zeros((64, 64))
v_data[24:40, 24:40] = 0.5
v = pde.ScalarField(grid, v_data + 0.01 * rng.random((64, 64)), label="v")
state = pde.FieldCollection([u, v])

eq = pde.PDE({
    "u": "0.2 * laplace(u) - u * v**2 + 0.04 * (1 - u)",
    "v": "0.1 * laplace(v) + u * v**2 - 0.14 * v",
})

result = eq.solve(state, t_range=200, dt=1.0, solver="etdrk4", tracker=None)
result.plot(title="Gray-Scott via ETDRK4 (dt = 1.0)")
