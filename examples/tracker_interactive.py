"""Follow a simulation live in napari with the interactive tracker.

Mirrors `/root/reference/examples/output/tracker_interactive.py`. The tracker
streams states into a napari viewer running in a separate process; napari is
optional, so the example skips gracefully when it is not installed.
"""

import pde_tpu as pde
from pde_tpu.trackers.interactive import napari_available

grid = pde.UnitGrid([32, 32])
state = pde.ScalarField.random_uniform(grid, 0.2, 0.3)
eq = pde.DiffusionPDE()

if napari_available():
    tracker = pde.InteractivePlotTracker(interrupts=0.1)
    eq.solve(state, t_range=2, dt=0.01, tracker=tracker)
else:
    print("napari not installed - running without the interactive tracker")
    eq.solve(state, t_range=2, dt=0.01, tracker=None)
