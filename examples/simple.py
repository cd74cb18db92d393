"""Simple diffusion equation — the README example.

Mirrors `/root/reference/examples/simple.py`.
"""

import pde_tpu as pde

grid = pde.UnitGrid([64, 64])  # generate grid
state = pde.ScalarField.random_uniform(grid, 0.2, 0.3)  # initial condition

eq = pde.DiffusionPDE(diffusivity=0.1)  # define the PDE
result = eq.solve(state, t_range=10, dt=0.1)  # solve it
result.plot(title="Diffusion result")
