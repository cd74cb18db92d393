"""Driving a PDE through a time-dependent boundary condition.

Mirrors `/root/reference/examples/simple_pdes/time_dependent_bcs.py`.
"""

import pde_tpu as pde

grid = pde.UnitGrid([16, 32])
state = pde.ScalarField(grid, data=0.0)

# oscillating Dirichlet value at the lower y boundary
bc = {"x": {"derivative": 0}, "y-": {"value_expression": "sin(3 * t)"},
      "y+": {"derivative": 0}}
eq = pde.DiffusionPDE(diffusivity=0.5, bc=bc)
result = eq.solve(state, t_range=4, dt=0.005, tracker=None)
result.plot(title="driven by an oscillating boundary")
