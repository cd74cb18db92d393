"""Second depth pass over storages, mirroring the reference's
`tests/storage/test_{generic,file,memory}_storages.py` behaviors."""

import numpy as np
import pytest

import pde_tpu as pde


def _fill(storage, grid=None, times=(0.0, 1.0, 2.0), rng=None):
    grid = grid or pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 0.0)
    storage.start_writing(field)
    for t in times:
        field = pde.ScalarField(grid, float(t) + 1.0)
        storage.append(field, t)
    storage.end_writing()
    return storage


@pytest.mark.parametrize("compression", [True, False])
def test_file_storage_compression(compression, tmp_path, rng):
    path = tmp_path / "traj.h5"
    storage = pde.FileStorage(str(path), compression=compression)
    _fill(storage)
    storage.close()
    loaded = pde.FileStorage(str(path), write_mode="readonly")
    assert len(loaded) == 3
    np.testing.assert_allclose(list(loaded.times), [0.0, 1.0, 2.0])
    np.testing.assert_allclose(loaded[2].to_numpy(), 3.0)
    loaded.close()


def test_file_storage_max_length(tmp_path):
    """Fixed-size storage pre-allocates and enforces the length."""
    path = tmp_path / "fixed.h5"
    storage = pde.FileStorage(str(path), max_length=2)
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 0.0)
    storage.start_writing(field)
    storage.append(pde.ScalarField(grid, 1.0), 0.0)
    storage.append(pde.ScalarField(grid, 2.0), 1.0)
    with pytest.raises(Exception):
        storage.append(pde.ScalarField(grid, 3.0), 2.0)
    storage.end_writing()
    storage.close()


@pytest.mark.parametrize("keep_opened", [True, False])
def test_file_storage_keep_opened(keep_opened, tmp_path):
    path = tmp_path / "traj.h5"
    storage = pde.FileStorage(str(path), keep_opened=keep_opened)
    _fill(storage)
    # reading back through the same object works in both modes
    assert len(storage) == 3
    np.testing.assert_allclose(storage[1].to_numpy(), 2.0)
    storage.close()


@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
def test_file_storage_dtypes(dtype, tmp_path, rng):
    path = tmp_path / "typed.h5"
    grid = pde.UnitGrid([4, 4])
    if np.issubdtype(dtype, np.complexfloating):
        data = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    else:
        data = rng.normal(size=(4, 4))
    field = pde.ScalarField(grid, data.astype(dtype))
    storage = pde.FileStorage(str(path))
    storage.start_writing(field)
    storage.append(field, 0.0)
    storage.end_writing()
    storage.close()
    loaded = pde.FileStorage(str(path), write_mode="readonly")
    assert np.asarray(loaded[0].data).dtype == np.dtype(dtype)
    np.testing.assert_allclose(np.asarray(loaded[0].data), data, atol=1e-12)
    loaded.close()


def test_file_storage_collection_roundtrip(tmp_path, rng):
    path = tmp_path / "coll.h5"
    grid = pde.UnitGrid([4, 4])
    coll = pde.FieldCollection(
        [
            pde.ScalarField.random_uniform(grid, rng=rng, label="a"),
            pde.ScalarField.random_uniform(grid, rng=rng, label="b"),
        ]
    )
    storage = pde.FileStorage(str(path))
    storage.start_writing(coll)
    storage.append(coll, 0.0)
    storage.append(2 * coll, 1.0)
    storage.end_writing()
    storage.close()

    loaded = pde.FileStorage(str(path), write_mode="readonly")
    assert loaded.has_collection
    first = loaded[0]
    assert isinstance(first, pde.FieldCollection)
    assert first.labels == ["a", "b"]
    np.testing.assert_allclose(first["a"].to_numpy(), coll["a"].to_numpy(), atol=1e-12)
    np.testing.assert_allclose(
        loaded[1]["b"].to_numpy(), 2 * coll["b"].to_numpy(), atol=1e-12
    )
    loaded.close()


def test_storage_truncation_modes(tmp_path, rng):
    """`truncate` clears on every simulation; `append` keeps growing."""
    grid = pde.UnitGrid([8])
    eq = pde.DiffusionPDE()
    state = pde.ScalarField.random_uniform(grid, rng=rng)

    path = tmp_path / "trunc.h5"
    storage = pde.FileStorage(str(path), write_mode="truncate")
    eq.solve(state, t_range=0.2, dt=0.01, tracker=storage.tracker(0.1))
    n_first = len(storage)
    eq.solve(state, t_range=0.2, dt=0.01, tracker=storage.tracker(0.1))
    assert len(storage) == n_first
    storage.close()

    storage = pde.MemoryStorage(write_mode="append")
    eq.solve(state, t_range=0.2, dt=0.01, tracker=storage.tracker(0.1))
    eq.solve(state, t_range=0.2, dt=0.01, tracker=storage.tracker(0.1))
    assert len(storage) == 2 * n_first


def test_storage_transformation_tracker(rng):
    """Store a transformed state (field + its gradient norm)."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)

    def transform(field, t):
        return pde.FieldCollection(
            [field, field.gradient("periodic").to_scalar("norm")]
        )

    storage = pde.MemoryStorage()
    eq = pde.DiffusionPDE()
    eq.solve(
        state, t_range=0.2, dt=0.01,
        tracker=storage.tracker(0.1, transformation=transform),
    )
    assert storage.has_collection
    assert len(storage) >= 2
    stored = storage[0]
    assert len(stored) == 2
    # second channel really is the gradient norm of the first
    np.testing.assert_allclose(
        stored[1].to_numpy(),
        stored[0].gradient("periodic").to_scalar("norm").to_numpy(),
        atol=1e-10,
    )


def test_memory_storage_type_guessing(rng):
    """from_fields infers scalar/vector field classes from data shape."""
    grid = pde.UnitGrid([4, 4])
    v = pde.VectorField.random_uniform(grid, rng=rng)
    storage = pde.MemoryStorage.from_fields(fields=[v, 2 * v], times=[0, 1])
    assert isinstance(storage[0], pde.VectorField)
    np.testing.assert_allclose(storage[1].to_numpy(), 2 * v.to_numpy(), atol=1e-12)


def test_movie_storage_vector_rejected(tmp_path, rng):
    """MovieStorage stores scalar channels; rank>0 fields are rejected."""
    grid = pde.UnitGrid([8, 8])
    v = pde.VectorField.random_uniform(grid, rng=rng)
    storage = pde.storage.MovieStorage(str(tmp_path / "v.avi"))
    with pytest.raises(Exception):
        storage.start_writing(v)
        storage.append(v, 0.0)


def test_movie_storage_stored_times(tmp_path, rng):
    grid = pde.UnitGrid([8, 8])
    eq = pde.DiffusionPDE()
    state = pde.ScalarField.random_uniform(grid, 0.2, 0.8, rng=rng)
    storage = pde.storage.MovieStorage(str(tmp_path / "t.avi"), vmin=0, vmax=1)
    eq.solve(state, t_range=0.4, dt=0.01, tracker=storage.tracker(0.1))
    times = np.asarray(list(storage.times))
    assert len(times) == len(storage)
    np.testing.assert_allclose(np.diff(times), 0.1, atol=1e-8)


def test_storage_getitem_negative_and_slice(rng):
    storage = _fill(pde.MemoryStorage())
    np.testing.assert_allclose(storage[-1].to_numpy(), 3.0)
    np.testing.assert_allclose(storage[0].to_numpy(), 1.0)
    with pytest.raises(IndexError):
        storage[10]


def test_storage_items_iteration(rng):
    storage = _fill(pde.MemoryStorage())
    pairs = list(storage.items())
    assert [t for t, _ in pairs] == [0.0, 1.0, 2.0]
    for t, field in pairs:
        np.testing.assert_allclose(field.to_numpy(), t + 1.0)


def test_storage_apply_two_arg_function(rng):
    storage = _fill(pde.MemoryStorage())
    result = storage.apply(lambda field, t: field + t)
    for t, field in result.items():
        np.testing.assert_allclose(field.to_numpy(), 2 * t + 1.0)
