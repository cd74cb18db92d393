"""Robin boundary conditions with spatially varying transfer coefficient.

A cooling plate whose lower edge loses heat through an imperfect contact:
the Robin (mixed) condition ``du/dn = const - gamma * u`` has a PER-POINT
``gamma`` array — high transfer on the left, nearly insulating on the
right. Per-point Robin factors lower into the fused Pallas kernels as
staged coefficient vectors (``helpers.bc_factors``), so the run stays on
the fast path (check ``solver.info["fused_step"]``).
"""

import numpy as np

import pde_tpu as pde

grid = pde.CartesianGrid([[0, 1], [0, 1]], [64, 64])
state = pde.ScalarField(grid, 1.0)  # uniformly hot plate

# heat-transfer coefficient varies along the lower wall: strong cooling on
# the left, nearly insulated on the right
x = grid.axes_coords[0]
gamma = 4.0 * np.exp(-8.0 * x)

bc = {
    "x": {"derivative": 0},
    "y-": {"type": "mixed", "value": gamma, "const": 0.0},
    "y+": {"derivative": 0},
}

eq = pde.DiffusionPDE(diffusivity=0.2, bc=bc)
result = eq.solve(state, t_range=1.0, dt=1e-4)
result.plot(title="Cooling through a spatially varying Robin boundary")
