"""Kuramoto-Sivashinsky chaos visualized as a kymograph."""

import pde_tpu as pde

grid = pde.CartesianGrid([[0, 32 * 3.141592653589793]], 256, periodic=True)
state = pde.ScalarField.random_uniform(grid, -0.1, 0.1)

eq = pde.KuramotoSivashinskyPDE()
storage = pde.MemoryStorage()
eq.solve(state, t_range=20, dt=0.01, tracker=storage.tracker(0.5))

pde.plot_kymograph(storage)
