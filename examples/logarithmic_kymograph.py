"""Logarithmically spaced snapshots rendered as a kymograph.

Mirrors `/root/reference/examples/output/logarithmic_kymograph.py` — useful
for processes with power-law coarsening dynamics.
"""

import numpy as np

import pde_tpu as pde
from pde_tpu.storage import MemoryStorage
from pde_tpu.trackers import LogarithmicInterrupts
from pde_tpu.visualization import plot_kymograph

grid = pde.CartesianGrid([(0, 32)], 128, periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(2))
eq = pde.CahnHilliardPDE()

storage = MemoryStorage()
eq.solve(
    state, t_range=10, dt=1e-3,
    tracker=storage.tracker(LogarithmicInterrupts(0.01, factor=1.5)),
)
print("snapshots:", len(storage))
plot_kymograph(storage)
