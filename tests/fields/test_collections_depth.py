"""FieldCollection behaviors mirroring `tests/fields/test_field_collections.py`."""

import numpy as np
import pytest

import pde_tpu as pde


def _make_collection(rng, grid=None):
    grid = grid or pde.UnitGrid([4, 4])
    return pde.FieldCollection(
        [
            pde.ScalarField.random_uniform(grid, rng=rng, label="s"),
            pde.VectorField.random_uniform(grid, rng=rng, label="v"),
        ]
    )


def test_collection_mixed_ranks(rng):
    coll = _make_collection(rng)
    assert len(coll) == 2
    assert isinstance(coll[0], pde.ScalarField)
    assert isinstance(coll[1], pde.VectorField)
    assert coll.labels == ["s", "v"]
    # access by label
    assert coll["s"] is coll[0]
    assert coll["v"] is coll[1]
    with pytest.raises(KeyError):
        coll["missing"]


def test_collection_requires_same_grid(rng):
    f1 = pde.ScalarField.random_uniform(pde.UnitGrid([4, 4]), rng=rng)
    f2 = pde.ScalarField.random_uniform(pde.UnitGrid([8, 8]), rng=rng)
    with pytest.raises(RuntimeError):
        pde.FieldCollection([f1, f2])
    with pytest.raises(ValueError):
        pde.FieldCollection([])
    with pytest.raises(RuntimeError):
        pde.FieldCollection([f1, pde.FieldCollection([f1])])


def test_collection_copy_independent(rng):
    coll = _make_collection(rng)
    dup = coll.copy()
    dup[0].data = 0.0
    assert not np.allclose(coll[0].to_numpy(), 0)
    assert dup.labels == coll.labels
    # label override
    named = coll.copy(label="named")
    assert named.label == "named"
    assert coll.label != "named"


def test_collection_append(rng):
    grid = pde.UnitGrid([4, 4])
    coll = _make_collection(rng, grid)
    extra = pde.ScalarField(grid, 2.0, label="extra")
    combined = coll.append(extra)
    assert len(combined) == 3
    assert combined.labels == ["s", "v", "extra"]
    # data was copied: mutating the original leaves the combined one intact
    extra.data = 7.0
    np.testing.assert_allclose(combined[2].to_numpy(), 2.0)
    # appending a collection flattens it
    both = coll.append(pde.FieldCollection([extra.copy()]), label="joined")
    assert len(both) == 3
    assert both.label == "joined"
    assert len(coll) == 2  # original unchanged


def test_collection_arithmetic(rng):
    coll = _make_collection(rng)
    doubled = coll + coll
    for orig, two in zip(coll, doubled):
        np.testing.assert_allclose(two.to_numpy(), 2 * orig.to_numpy())
    scaled = 3 * coll
    for orig, three in zip(coll, scaled):
        np.testing.assert_allclose(three.to_numpy(), 3 * orig.to_numpy())
    diff = doubled - coll
    for orig, one in zip(coll, diff):
        np.testing.assert_allclose(one.to_numpy(), orig.to_numpy(), atol=1e-12)


def test_collection_smoothing(rng):
    coll = _make_collection(rng)
    smoothed = coll.smooth(1.0)
    for raw, sm in zip(coll, smoothed):
        np.testing.assert_allclose(
            sm.to_numpy(), raw.smooth(1.0).to_numpy(), atol=1e-12
        )


def test_collection_packed_data_roundtrip(rng):
    coll = _make_collection(rng)
    packed = np.asarray(coll.data)
    assert packed.shape[0] == 1 + 2  # scalar + two vector components
    restored = coll.copy()
    restored.data = packed
    for a, b in zip(coll, restored):
        np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


def test_collection_labels_setter(rng):
    coll = _make_collection(rng)
    coll.labels = ["a", "b"]
    assert coll.labels == ["a", "b"]
    with pytest.raises(ValueError):
        coll.labels = ["only-one"]


def test_collection_apply(rng):
    # callable: applied to the packed data view, returns a new collection
    coll = _make_collection(rng)
    doubled = coll.apply(lambda data: 2 * data)
    for orig, two in zip(coll, doubled):
        np.testing.assert_allclose(two.to_numpy(), 2 * orig.to_numpy())
    # expression: field labels name the fields, result is a single field
    grid = pde.UnitGrid([3, 5])
    s = pde.ScalarField(grid, 2, label="s1")
    v = pde.VectorField.random_uniform(grid, label="v2", rng=rng)
    product = pde.FieldCollection([s, v]).apply("s1 * v2")
    np.testing.assert_allclose(product.to_numpy(), v.to_numpy() * 2, atol=1e-12)


def test_collection_single_field(rng):
    field = pde.ScalarField.random_uniform(pde.UnitGrid([3, 3]), rng=rng)
    coll = pde.FieldCollection([field])
    assert len(coll) == 1
    np.testing.assert_array_equal(np.asarray(coll.data)[0], field.to_numpy())


def test_collection_from_dict(rng):
    grid = pde.UnitGrid([3, 3])
    coll = pde.FieldCollection.from_dict(
        {"a": pde.ScalarField(grid, 1.0), "b": pde.ScalarField(grid, 2.0)}
    )
    assert coll.labels == ["a", "b"]
    np.testing.assert_allclose(coll["b"].to_numpy(), 2.0)


def test_collection_integrals_and_averages(rng):
    grid = pde.CartesianGrid([[0, 2]], [16])
    coll = pde.FieldCollection(
        [pde.ScalarField(grid, 3.0), pde.ScalarField(grid, -1.0)]
    )
    integrals = [float(f.integral) for f in coll]
    np.testing.assert_allclose(integrals, [6.0, -2.0], rtol=1e-12)
    averages = [float(f.average) for f in coll]
    np.testing.assert_allclose(averages, [3.0, -1.0], rtol=1e-12)


def test_collection_dtype_promotion(rng):
    grid = pde.UnitGrid([3, 3])
    coll = pde.FieldCollection(
        [pde.ScalarField(grid, 1.0), pde.ScalarField(grid, 1.0 + 0j)]
    )
    assert coll.is_complex
    real = pde.FieldCollection([pde.ScalarField(grid, 1.0)])
    assert not real.is_complex


def test_collection_hdf5_roundtrip(rng, tmp_path):
    coll = _make_collection(rng)
    path = tmp_path / "coll.h5"
    coll.to_file(str(path))
    loaded = pde.FieldBase.from_file(str(path))
    assert isinstance(loaded, pde.FieldCollection)
    assert loaded.labels == coll.labels
    for a, b in zip(coll, loaded):
        np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), atol=1e-12)


def test_scalar_random_uniform_collection(rng):
    coll = pde.FieldCollection.scalar_random_uniform(
        3, pde.UnitGrid([4, 4]), rng=rng
    )
    assert len(coll) == 3
    assert all(isinstance(f, pde.ScalarField) for f in coll)
    assert not np.array_equal(coll[0].to_numpy(), coll[1].to_numpy())


def test_collection_plotting(rng, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    coll = _make_collection(rng)
    path = tmp_path / "coll.png"
    coll.plot(filename=str(path))
    assert path.stat().st_size > 0
