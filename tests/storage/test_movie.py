"""MovieStorage encode→decode round-trips (raw backend; ffmpeg when present).

Reference behavior: `/root/reference/pde/storage/movie.py:83` — quantized
frames + JSON sidecar with reconstruction metadata.
"""

import json

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.storage.movie import MovieStorage


@pytest.mark.parametrize("bits", [8, 16])
def test_movie_storage_roundtrip(bits, rng, tmp_path):
    path = tmp_path / "movie.avi"
    grid = pde.UnitGrid([8, 16])
    storage = MovieStorage(str(path), vmin=0, vmax=1, bits_per_channel=bits)
    fields = [
        pde.ScalarField(grid, data=rng.random((8, 16)), label="c")
        for _ in range(4)
    ]
    storage.start_writing(fields[0])
    for i, f in enumerate(fields):
        storage.append(f, time=0.5 * i)
    storage.end_writing()
    assert path.exists()
    assert json.load(open(str(path) + ".json"))["bits_per_channel"] == bits

    # read back through a fresh instance (reconstructs field from the sidecar)
    loaded = MovieStorage(str(path))
    assert len(loaded) == 4
    assert loaded.times == [0.0, 0.5, 1.0, 1.5]
    tol = 1.0 / (2**bits - 1)  # quantization error bound
    for i, f in enumerate(fields):
        np.testing.assert_allclose(
            np.asarray(loaded.data[i]), np.asarray(f.data), atol=tol
        )
    # field reconstruction from serialized attributes
    field = loaded[2]
    assert isinstance(field, pde.ScalarField)
    assert field.grid.shape == (8, 16)
    np.testing.assert_allclose(
        np.asarray(field.data), np.asarray(fields[2].data), atol=tol
    )


def test_movie_storage_clipping(tmp_path):
    """Values outside [vmin, vmax] are clipped by the quantizer."""
    path = tmp_path / "clip.avi"
    grid = pde.UnitGrid([8, 8])
    storage = MovieStorage(str(path), vmin=0.0, vmax=1.0)
    f = pde.ScalarField(grid, data=np.linspace(-1, 2, 64).reshape(8, 8))
    storage.start_writing(f)
    storage.append(f, time=0.0)
    storage.end_writing()
    loaded = MovieStorage(str(path))
    frame = np.asarray(loaded.data[0])
    assert frame.min() >= 0.0 and frame.max() <= 1.0


def test_movie_storage_tracker_integration(rng, tmp_path):
    """MovieStorage works as a solve() tracker sink."""
    path = tmp_path / "run.avi"
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = MovieStorage(str(path), vmin=0, vmax=1)
    eq = pde.DiffusionPDE(0.1)
    eq.solve(state, t_range=0.1, dt=0.01,
             tracker=storage.tracker(interrupts=0.05))
    assert len(storage) >= 2
    # diffusion smooths: later frames have smaller range
    first, last = storage.data[0], storage.data[len(storage) - 1]
    assert np.ptp(np.asarray(last)) <= np.ptp(np.asarray(first)) + 1e-3


def test_movie_storage_rejects_non_2d(tmp_path):
    grid = pde.UnitGrid([8])
    f = pde.ScalarField(grid, data=np.zeros(8))
    storage = MovieStorage(str(tmp_path / "x.avi"))
    with pytest.raises(NotImplementedError):
        storage.start_writing(f)


def test_movie_storage_invalid_bits(tmp_path):
    with pytest.raises(ValueError):
        MovieStorage(str(tmp_path / "x.avi"), bits_per_channel=12)
