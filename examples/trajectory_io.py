"""Writing a trajectory to HDF5 and reading it back for analysis.

Mirrors `/root/reference/examples/output/trajectory_io.py`.
"""

import tempfile
from pathlib import Path

import numpy as np

import pde_tpu as pde
from pde_tpu.storage import FileStorage

path = Path(tempfile.mkdtemp()) / "trajectory.h5"

grid = pde.UnitGrid([16, 16], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(7))
eq = pde.DiffusionPDE()
storage = FileStorage(str(path), write_mode="truncate")
eq.solve(state, t_range=1, dt=0.01, tracker=storage.tracker(0.25))
storage.close()

# read back in a fresh storage object
reader = FileStorage(str(path), write_mode="read_only")
print("times:", [round(t, 3) for t in reader.times])
for time, field in reader.items():
    print(f"t={time:.2f}: average={float(field.average):.5f}")
reader.close()
