"""Kuramoto-Sivashinsky dynamics in one dimension via the expression PDE.

Mirrors `/root/reference/examples/simple_pdes/pde_1d_expression.py`.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 64)], 128, periodic=True)
state = pde.ScalarField.random_harmonic(grid, modes=3)

eq = pde.PDE({"u": "-laplace(u) - laplace(laplace(u)) - gradient_squared(u) / 2"})
result = eq.solve(state, t_range=5, dt=0.005, tracker=None)
result.plot(title="KS equation, t=5")
