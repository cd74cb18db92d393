"""The classical wave equation as a 2-field system.

Reference model: `/root/reference/pde/pdes/wave.py:25`.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 10)], 128, periodic=True)
u = pde.ScalarField.from_expression(grid, "exp(-(x - 5)**2 * 4)", label="u")
eq = pde.WavePDE(speed=1.0)
state = eq.get_initial_condition(u)
result = eq.solve(state, t_range=2, dt=1e-3, tracker=None)
result[0].plot(title="wave at t=2")
