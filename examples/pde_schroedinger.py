"""Free Schrödinger equation with a complex field.

Mirrors `/root/reference/examples/simple_pdes/pde_schroedinger.py`.
"""

import numpy as np

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 20)], 128, periodic=False)
# initial wave packet with momentum
x = grid.axes_coords[0]
psi0 = np.exp(-((x - 5.0) ** 2)) * np.exp(2j * x)
state = pde.ScalarField(grid, data=psi0.astype(complex), label="ψ")

eq = pde.PDE({"ψ": "I * laplace(ψ)"})
result = eq.solve(state, t_range=1.0, dt=1e-4, tracker=None)
(result.to_scalar("norm_squared")).plot(title="|ψ|² at t=1")
