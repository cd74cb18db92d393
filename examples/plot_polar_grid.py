"""Fields on polar (and spherical) symmetric grids.

Mirrors `/root/reference/examples/fields/plot_polar_grid.py`.
"""

import pde_tpu as pde

grid = pde.PolarSymGrid(radius=5, shape=32)
field = pde.ScalarField.from_expression(grid, "exp(-r**2 / 4)")
field.plot(title="polar field")

lap = field.laplace({"derivative": 0})
lap.plot(title="its Laplacian")
