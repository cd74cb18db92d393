"""A traveling wave imposed at the boundary of a diffusive medium.

The lower edge is driven by ``sin(4x - 8t)`` — a boundary value varying in
BOTH space and time. Such conditions lower into the fused Pallas kernels
as per-chunk step-indexed value tables (one row per temporal-block step),
so even this fully dynamic forcing keeps the temporal-blocking fast path
(`solver.info["fused_step"]`); the XLA path computes the identical
trajectory.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([[0, 3.14159265], [0, 3.14159265]], [64, 64])
state = pde.ScalarField(grid, 0.0)

bc = {
    "x": {"derivative": 0},
    "y-": {"value_expression": "sin(4 * x - 8 * t)"},
    "y+": {"derivative": 0},
}

eq = pde.DiffusionPDE(diffusivity=0.5, bc=bc)
result = eq.solve(state, t_range=2.0, dt=5e-5)
result.plot(title="Diffusion driven by a traveling boundary wave")
