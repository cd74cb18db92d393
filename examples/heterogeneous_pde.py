"""A PDE whose coefficients vary in space (explicit coordinate dependence).

Mirrors `/root/reference/examples/advanced_pdes/heterogeneous_pde.py`.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([(-5, 5)], 64)
field = pde.ScalarField(grid, data=0.0, label="c")

# source term active only on the left half of the domain: tanh gate on x
eq = pde.PDE({"c": "laplace(c) + (1 - tanh(5 * x)) / 2"})
result = eq.solve(field, t_range=2, dt=0.01, tracker=None)
result.plot(title="heterogeneous source")
