"""Solve Poisson's equation with Dirichlet boundary conditions."""

import pde_tpu as pde
from pde_tpu.models import solve_poisson_equation

grid = pde.CartesianGrid([[0, 1]] * 2, 32)
field = pde.ScalarField(grid, 1.0)

result = solve_poisson_equation(field, bc={"value": 0})
result.plot(title="Poisson solution")
