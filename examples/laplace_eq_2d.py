"""Solving the Laplace equation with inhomogeneous boundary values.

Mirrors `/root/reference/examples/simple_pdes/laplace_eq_2d.py`.
"""

import numpy as np

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 64)
bcs = {"x": {"value": "sin(y)"}, "y": {"value": "sin(x)"}}

res = pde.solve_laplace_equation(grid, bcs)
res.plot(title="Laplace equation")
