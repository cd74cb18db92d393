"""Tests for storage classes (mirrors reference tests/storage/)."""

import numpy as np
import pytest

import pde_tpu as pde


def test_memory_storage_basics(rng):
    grid = pde.UnitGrid([4, 4])
    f1 = pde.ScalarField.random_uniform(grid, rng=rng, label="a")
    storage = pde.MemoryStorage()
    storage.start_writing(f1)
    storage.append(f1, 0.0)
    storage.append(f1 * 2, 1.0)
    storage.end_writing()
    assert len(storage) == 2
    assert storage.times == [0.0, 1.0]
    assert isinstance(storage[0], pde.ScalarField)
    np.testing.assert_allclose(np.asarray(storage[1].data), 2 * np.asarray(f1.data))
    # iteration and items
    times = [t for t, _ in storage.items()]
    assert times == [0.0, 1.0]
    assert storage[-1] == storage[1]


def test_memory_storage_from_fields(rng):
    grid = pde.UnitGrid([4])
    fields = [pde.ScalarField.random_uniform(grid, rng=rng) for _ in range(3)]
    storage = pde.MemoryStorage.from_fields([0, 1, 2], fields)
    assert len(storage) == 3
    assert storage[2] == fields[2]


def test_storage_tracker(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE()
    storage = pde.MemoryStorage()
    eq.solve(state, t_range=1.0, dt=0.01, tracker=storage.tracker(0.25))
    assert len(storage) == 5
    np.testing.assert_allclose(storage.times, [0, 0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(np.asarray(storage[0].data), np.asarray(state.data))


def test_storage_apply_and_extract(rng):
    grid = pde.UnitGrid([4])
    a = pde.ScalarField.random_uniform(grid, rng=rng, label="a")
    b = pde.ScalarField.random_uniform(grid, rng=rng, label="b")
    storage = pde.MemoryStorage.from_fields(
        [0, 1], [pde.FieldCollection([a, b]), pde.FieldCollection([a * 2, b * 3])]
    )
    assert storage.has_collection
    sub = storage.extract_field("b")
    assert len(sub) == 2
    np.testing.assert_allclose(np.asarray(sub[1].data), 3 * np.asarray(b.data))
    doubled = storage.apply(lambda f: f[0] * 2)
    np.testing.assert_allclose(np.asarray(doubled[0].data), 2 * np.asarray(a.data))
    view = storage.view_field("a")
    assert len(view) == 2
    np.testing.assert_allclose(np.asarray(view[1].data), 2 * np.asarray(a.data))


def test_file_storage_roundtrip(tmp_path, rng):
    import h5py  # noqa: F401 — skip if unavailable

    grid = pde.CartesianGrid([(0, 2), (0, 2)], (6, 6), periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng, label="file-test")
    path = str(tmp_path / "storage.h5")
    storage = pde.FileStorage(path)
    eq = pde.DiffusionPDE()
    eq.solve(state, t_range=0.5, dt=0.01, tracker=storage.tracker(0.25))
    storage.close()

    restored = pde.FileStorage(path, write_mode="readonly")
    assert len(restored) == 3
    np.testing.assert_allclose(restored.times, [0, 0.25, 0.5])
    field = restored[0]
    assert isinstance(field, pde.ScalarField)
    assert field.grid == grid
    np.testing.assert_allclose(np.asarray(field.data), np.asarray(state.data))


def test_extract_time_range(rng):
    grid = pde.UnitGrid([4])
    f = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = pde.MemoryStorage.from_fields([0.0, 1.0, 2.0, 3.0], [f, f, f, f])
    sub = storage.extract_time_range((1.0, 2.0))
    assert sub.times == [1.0, 2.0]
