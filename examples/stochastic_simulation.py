"""Stochastic KPZ interface growth (Euler-Maruyama)."""

import pde_tpu as pde

grid = pde.CartesianGrid([[0, 100]], 256, periodic=True)
state = pde.ScalarField(grid, 0.0)

eq = pde.KPZInterfacePDE(noise=1.0)
storage = pde.MemoryStorage()
eq.solve(state, t_range=10, dt=0.01, tracker=storage.tracker(1.0))

pde.plot_kymograph(storage)
