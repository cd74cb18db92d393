"""Storage backends: in-memory, HDF5 file, and quantized movie frames.

Mirrors `/root/reference/examples/output/storages.py`.
"""

import tempfile
from pathlib import Path

import numpy as np

import pde_tpu as pde
from pde_tpu.storage import FileStorage, MemoryStorage
from pde_tpu.storage.movie import MovieStorage

grid = pde.UnitGrid([16, 16], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(1))
eq = pde.DiffusionPDE()

tmp = Path(tempfile.mkdtemp())
memory = MemoryStorage()
file_storage = FileStorage(str(tmp / "run.h5"))
movie = MovieStorage(str(tmp / "run.avi"), vmin=0, vmax=1)

eq.solve(
    state, t_range=1, dt=0.01,
    tracker=[memory.tracker(0.2), file_storage.tracker(0.2), movie.tracker(0.2)],
)

print("memory snapshots:", len(memory))
print("file snapshots:  ", len(file_storage))
print("movie frames:    ", len(movie))
file_storage.close()
