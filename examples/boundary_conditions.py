"""Showcase of the boundary-condition mini-language.

Mirrors `/root/reference/examples/simple_pdes/boundary_conditions.py`.
"""

import pde_tpu as pde

grid = pde.UnitGrid([32, 32], periodic=[False, True])
state = pde.ScalarField.random_uniform(grid, 0.2, 0.3)

# different condition per side: fixed value at x-, no flux at x+, periodic y
bc = {"x-": {"value": 1}, "x+": {"derivative": 0}, "y": "periodic"}
eq = pde.DiffusionPDE(bc=bc)
result = eq.solve(state, t_range=5, dt=0.005, tracker=None)
result.plot(title=eq.bc and "mixed boundary conditions")
