"""Using trackers and storage to instrument a simulation."""

import pde_tpu as pde

grid = pde.UnitGrid([32, 32])
state = pde.ScalarField.random_uniform(grid, 0.2, 0.3)

storage = pde.MemoryStorage()
data = pde.DataTracker(lambda field, t: float(field.fluctuations), interrupts=1)
trackers = [
    "consistency",
    storage.tracker(interrupts=1),
    data,
    pde.PrintTracker(interrupts=5),
]

eq = pde.DiffusionPDE()
eq.solve(state, t_range=10, dt=0.05, tracker=trackers)

print("stored frames:", len(storage))
print("fluctuation decay:", data.data[0], "->", data.data[-1])
pde.plot_magnitudes(storage)
