"""Store a simulation with :class:`~pde_tpu.storage.ModelrunnerStorage`.

Mirrors `/root/reference/examples/output/py_modelrunner.py`. The
`py-modelrunner` package is optional; without it this example falls back to
:class:`~pde_tpu.FileStorage` so the script still demonstrates the storage
protocol end to end.
"""

import tempfile
from pathlib import Path

import pde_tpu as pde

grid = pde.UnitGrid([32, 32])
state = pde.ScalarField.random_uniform(grid, 0.2, 0.3)
eq = pde.DiffusionPDE()

path = Path(tempfile.mkdtemp())
try:
    from modelrunner import ModelResult  # noqa: F401

    storage = pde.storage.ModelrunnerStorage(path / "diffusion.json", mode="truncate")
except ImportError:
    print("py-modelrunner not installed - storing with FileStorage instead")
    storage = pde.FileStorage(path / "diffusion.h5", write_mode="truncate")

eq.solve(state, t_range=1, dt=0.01, tracker=storage.tracker(0.1))

# read the trajectory back
print("stored times:", list(storage.times))
storage.close()
