"""Create a movie while the simulation runs (PlotTracker with ``movie=``).

Mirrors `/root/reference/examples/output/make_movie_live.py`. Writing movies
requires the `ffmpeg` binary; when it is missing the tracker still plots, it
just cannot encode — so this example degrades to a plain plot tracker.
"""

import tempfile
from pathlib import Path

import pde_tpu as pde
from pde_tpu.visualization.movies import Movie

grid = pde.UnitGrid([16, 16])  # generate grid
state = pde.ScalarField.random_uniform(grid, 0.2, 0.3)  # initial condition

if Movie.is_available():
    movie_file = Path(tempfile.mkdtemp()) / "diffusion.mov"
    tracker = pde.PlotTracker(interrupts=0.1, movie=movie_file)
else:
    print("ffmpeg not found - plotting without writing a movie")
    tracker = pde.PlotTracker(interrupts=0.1)

eq = pde.DiffusionPDE()  # define the physics
eq.solve(state, t_range=2, dt=0.005, tracker=tracker)
