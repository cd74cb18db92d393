"""Working with Cartesian grids: bounds, discretization, integration.

Mirrors `/root/reference/examples/simple_pdes/cartesian_grid.py`.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([(-1, 1), (0, 2)], [32, 16])
print("shape:", grid.shape)
print("discretization:", grid.discretization)
print("volume:", grid.volume)

field = pde.ScalarField.from_expression(grid, "exp(-x**2) * cos(y)")
print("integral:", float(field.integral))
field.plot(title="field on a Cartesian grid")
