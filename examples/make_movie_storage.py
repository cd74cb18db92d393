"""Recording a simulation directly into a (quantized) movie file.

Mirrors `/root/reference/examples/output/make_movie_storage.py`. Without the
ffmpeg binary the frames are stored uncompressed with the same quantization.
"""

import tempfile
from pathlib import Path

import numpy as np

import pde_tpu as pde
from pde_tpu.storage.movie import MovieStorage

path = Path(tempfile.mkdtemp()) / "diffusion.avi"

grid = pde.UnitGrid([24, 24], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
eq = pde.DiffusionPDE()

storage = MovieStorage(str(path), vmin=0, vmax=1, bits_per_channel=16)
eq.solve(state, t_range=1, dt=0.01, tracker=storage.tracker(0.1))

print("frames written:", len(storage))
# frames can be read back (lossy only through quantization)
frame = storage.data[0]
print("first frame range:", float(np.min(frame)), "-", float(np.max(frame)))
