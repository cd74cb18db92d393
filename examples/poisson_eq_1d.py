"""Solving a 1D Poisson problem with mixed boundary conditions.

Mirrors `/root/reference/examples/simple_pdes/poisson_eq_1d.py`.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 1)], 32)
field = pde.ScalarField(grid, data=1.0, label="charge density")
result = pde.solve_poisson_equation(
    field, bc={"x-": {"value": 0}, "x+": {"derivative": 1}}
)
result.plot(title="Poisson equation")
