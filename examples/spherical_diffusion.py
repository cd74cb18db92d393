"""Diffusion on a spherically symmetric grid with conservative stencils."""

import pde_tpu as pde

grid = pde.SphericalSymGrid(radius=5, shape=64)
state = pde.ScalarField.from_expression(grid, "exp(-(r - 2)**2 * 4)")

eq = pde.DiffusionPDE(diffusivity=0.5)
result = eq.solve(state, t_range=1.0, dt=1e-4)

print("mass before:", float(state.integral))
print("mass after: ", float(result.integral))
result.plot(title="Spherical diffusion")
