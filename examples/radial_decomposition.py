"""Radially decomposed solving on curvilinear grids (SPMD).

Any solver accepts ``decomposition`` on polar/spherical/cylindrical grids,
including cuts along the RADIAL axis: one compiled stepper serves every
annular shard — shard-varying stencil coefficients are sliced from the
global coordinate arrays by ``lax.axis_index`` inside ``shard_map``
(``pde_tpu.grids.base.axis_coords_traced``). The reference instead compiles
one operator per MPI rank on its own subgrid (`pde/grids/_mesh.py:481`).
Decomposed results are BIT-identical to serial ones.

Run with virtual devices to try without hardware:
    XLA_FLAGS=--xla_force_host_platform_device_count=4 python radial_decomposition.py
"""

import jax
import numpy as np

import pde_tpu as pde

grid = pde.SphericalSymGrid(radius=1.0, shape=64)
state = pde.ScalarField.from_expression(grid, "exp(-20 * (r - 0.5)**2)")
eq = pde.DiffusionPDE(diffusivity=0.1)

serial = eq.solve(state, t_range=0.05, dt=1e-4, tracker=None)

n = min(4, len(jax.devices()))
sharded = eq.solve(state, t_range=0.05, dt=1e-4, tracker=None, decomposition=[n])

print(f"devices: {n}, decomposition: [{n}] (radial cuts -> annular shards)")
print("bit-identical to serial:",
      bool(np.array_equal(np.asarray(serial.data), np.asarray(sharded.data))))
serial.plot(title="diffused shell")
