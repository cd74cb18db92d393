"""Heterogeneous and time-dependent boundary conditions via expressions."""

import pde_tpu as pde

grid = pde.CartesianGrid([[0, 1], [0, 1]], [32, 32])
state = pde.ScalarField(grid, 0.0)

# lower y boundary follows sin(pi x); upper y boundary oscillates in time
bc = {
    "x": {"derivative": 0},
    "y-": {"value_expression": "sin(3.141592653589793 * x)"},
    "y+": {"value_expression": "sin(t)"},
}

eq = pde.DiffusionPDE(bc=bc)
result = eq.solve(state, t_range=2, dt=1e-4)
result.plot(title="Heterogeneous boundary conditions")
