"""Cahn-Hilliard equation written as an expression (spinodal decomposition)."""

import pde_tpu as pde

grid = pde.UnitGrid([64, 64], periodic=True)
state = pde.ScalarField.random_uniform(grid, -0.5, 0.5)

eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
result = eq.solve(state, t_range=10, dt=0.01)
result.plot(title="Cahn-Hilliard")
