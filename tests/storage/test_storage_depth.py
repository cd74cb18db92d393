"""Deeper storage coverage: views, extraction, apply/copy, write modes.

Extends `tests/storage/test_storage.py` toward the reference's storage suite
(`/root/reference/pde/storage/base.py:391-570` extract/apply/copy,
`StorageView` `:640`).
"""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.storage import FileStorage, MemoryStorage
from pde_tpu.storage.base import StorageView


def _filled_storage(rng, n=5):
    grid = pde.UnitGrid([6, 6], periodic=True)
    storage = MemoryStorage()
    fields = []
    for i in range(n):
        f = pde.ScalarField(grid, data=rng.random((6, 6)), label="c")
        fields.append(f)
        if i == 0:
            storage.start_writing(f)
        storage.append(f, time=0.1 * i)
    storage.end_writing()
    return storage, fields


def test_memory_storage_iteration(rng):
    storage, fields = _filled_storage(rng)
    assert len(storage) == 5
    for (t, field), orig in zip(storage.items(), fields):
        np.testing.assert_allclose(np.asarray(field.data),
                                   np.asarray(orig.data))
    np.testing.assert_allclose(storage.times, 0.1 * np.arange(5))


def test_storage_apply(rng):
    storage, fields = _filled_storage(rng)
    doubled = storage.apply(lambda f: 2 * f)
    assert len(doubled) == 5
    np.testing.assert_allclose(
        np.asarray(doubled[3].data), 2 * np.asarray(fields[3].data)
    )


def test_storage_copy(rng):
    storage, _ = _filled_storage(rng)
    clone = storage.copy()
    assert len(clone) == len(storage)
    np.testing.assert_allclose(
        np.asarray(clone[0].data), np.asarray(storage[0].data)
    )


def test_storage_extract_field_from_collection(rng):
    grid = pde.UnitGrid([4, 4])
    storage = MemoryStorage()
    for i in range(3):
        u = pde.ScalarField(grid, data=rng.random((4, 4)), label="u")
        v = pde.ScalarField(grid, data=rng.random((4, 4)), label="v")
        fc = pde.FieldCollection([u, v])
        if i == 0:
            storage.start_writing(fc)
        storage.append(fc, time=float(i))
    storage.end_writing()
    extracted = storage.extract_field("v")
    assert len(extracted) == 3
    assert extracted[0].label == "v"
    np.testing.assert_allclose(
        np.asarray(extracted[2].data), np.asarray(storage[2][1].data)
    )


def test_storage_extract_time_range(rng):
    storage, _ = _filled_storage(rng)
    sub = storage.extract_time_range((0.15, 0.35))
    np.testing.assert_allclose(sub.times, [0.2, 0.3])


def test_storage_view_field_selection(rng):
    """StorageView exposes one field of a stored collection."""
    grid = pde.UnitGrid([4, 4])
    storage = MemoryStorage()
    for i in range(3):
        u = pde.ScalarField(grid, data=rng.random((4, 4)), label="u")
        v = pde.ScalarField(grid, data=rng.random((4, 4)), label="v")
        fc = pde.FieldCollection([u, v])
        if i == 0:
            storage.start_writing(fc)
        storage.append(fc, time=float(i))
    storage.end_writing()
    view = StorageView(storage, field=1)
    assert len(view) == 3
    np.testing.assert_allclose(
        np.asarray(view[1].data), np.asarray(storage[1][1].data)
    )
    for t, f in view.items():
        assert f.label == "v"


def test_file_storage_roundtrip_and_readonly(rng, tmp_path):
    path = tmp_path / "series.h5"
    grid = pde.UnitGrid([5, 5])
    storage = FileStorage(str(path), write_mode="truncate")
    data = []
    for i in range(4):
        f = pde.ScalarField(grid, data=rng.random((5, 5)), label="c")
        data.append(np.asarray(f.data))
        if i == 0:
            storage.start_writing(f)
        storage.append(f, time=float(i))
    storage.end_writing()
    storage.close()

    reader = FileStorage(str(path), write_mode="read_only")
    assert len(reader) == 4
    assert reader[1].grid.shape == (5, 5)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(reader[i].data), data[i])
    reader.close()


def test_file_storage_append_mode(rng, tmp_path):
    path = tmp_path / "appendable.h5"
    grid = pde.UnitGrid([4])
    f = pde.ScalarField(grid, data=rng.random(4))
    storage = FileStorage(str(path), write_mode="truncate")
    storage.start_writing(f)
    storage.append(f, time=0.0)
    storage.end_writing()
    storage.close()

    # re-open and append (checkpoint/resume primitive, SURVEY §5.4)
    again = FileStorage(str(path), write_mode="append")
    again.start_writing(f)
    again.append(f, time=1.0)
    again.end_writing()
    assert len(again) == 2
    np.testing.assert_allclose(again.times, [0.0, 1.0])
    again.close()


def test_storage_tracker_interrupts(rng):
    grid = pde.UnitGrid([6, 6], periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    storage = MemoryStorage()
    eq = pde.DiffusionPDE(0.1)
    eq.solve(state, t_range=1.0, dt=0.01, tracker=storage.tracker(0.25))
    np.testing.assert_allclose(storage.times, [0.0, 0.25, 0.5, 0.75, 1.0],
                               atol=1e-8)


def test_memory_storage_from_collection_helpers(rng):
    """MemoryStorage.from_fields classmethod reconstruction."""
    grid = pde.UnitGrid([4])
    fields = [pde.ScalarField(grid, data=rng.random(4)) for _ in range(3)]
    storage = MemoryStorage.from_fields(times=[0.0, 1.0, 2.0], fields=fields)
    assert len(storage) == 3
    np.testing.assert_allclose(
        np.asarray(storage[2].data), np.asarray(fields[2].data)
    )
