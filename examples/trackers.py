"""Trackers: callbacks, data collection, and steady-state detection.

Mirrors `/root/reference/examples/output/trackers.py`.
"""

import numpy as np

import pde_tpu as pde

grid = pde.UnitGrid([16, 16], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(5))
eq = pde.DiffusionPDE()

data_tracker = pde.DataTracker(lambda s, t: float(s.fluctuations), interrupts=0.2)


def print_average(state, t):
    print(f"t={t:.2f}: average={float(state.average):.5f}")


result = eq.solve(
    state, t_range=1, dt=0.01,
    tracker=[
        pde.CallbackTracker(print_average, interrupts=0.5),
        data_tracker,
        "steady_state",
    ],
)
print("fluctuation history:", [f"{v:.4f}" for v in data_tracker.data])
