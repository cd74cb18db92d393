"""Additional field tests: construction forms, dtypes, copies, image data."""

import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.fields.base import field_from_serialized_attributes


def test_field_construction_forms():
    grid = pde.UnitGrid([4, 4])
    assert float(pde.ScalarField(grid, "zeros").data.sum()) == 0
    assert float(pde.ScalarField(grid, "ones").data.sum()) == 16
    assert pde.ScalarField(grid, "random").data.shape == (4, 4)
    # scalar broadcast
    f = pde.ScalarField(grid, 2.5)
    np.testing.assert_allclose(np.asarray(f.data), 2.5)
    # from another field
    g = pde.ScalarField(grid, f)
    assert g == f
    # from full data with ghost cells
    full = np.zeros((6, 6))
    full[1:-1, 1:-1] = 3.0
    h = pde.ScalarField(grid, full, with_ghost_cells=True)
    np.testing.assert_allclose(np.asarray(h.data), 3.0)
    with pytest.raises(ValueError):
        pde.ScalarField(grid, "bogus")


def test_field_dtype_handling():
    grid = pde.UnitGrid([4])
    assert pde.ScalarField(grid, 1).dtype == jnp.float64  # int promotes to float
    assert pde.ScalarField(grid, 1.0, dtype=jnp.float32).dtype == jnp.float32
    assert pde.ScalarField(grid, 1 + 0j).is_complex
    f32 = pde.ScalarField(grid, np.ones(4, dtype=np.float32))
    assert f32.dtype == jnp.float32  # dtype inferred from data
    # copy with dtype conversion
    assert f32.copy(dtype=complex).is_complex


def test_field_copy_and_label():
    grid = pde.UnitGrid([4])
    f = pde.ScalarField(grid, 1.0, label="orig")
    c = f.copy()
    assert c == f and c.label == "orig"
    c2 = f.copy(label="new")
    assert c2.label == "new"
    f.label = None
    with pytest.raises(TypeError):
        f.label = 42


def test_field_iadd_semantics():
    grid = pde.UnitGrid([4])
    f = pde.ScalarField(grid, 1.0)
    g = f
    f += 1
    assert g is f
    np.testing.assert_allclose(np.asarray(f.data), 2.0)


def test_field_serialization_roundtrip(rng):
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (4, 6), periodic=[True, False])
    for field in [
        pde.ScalarField.random_uniform(grid, rng=rng, label="s"),
        pde.VectorField.random_uniform(grid, rng=rng, label="v"),
        pde.Tensor2Field.random_uniform(grid, rng=rng, label="t"),
        pde.FieldCollection(
            [pde.ScalarField.random_uniform(grid, rng=rng, label="a"),
             pde.VectorField.random_uniform(grid, rng=rng, label="b")]
        ),
    ]:
        attrs = field.attributes_serialized
        restored = field_from_serialized_attributes(attrs, np.asarray(field.data))
        assert type(restored) is type(field)
        assert restored.grid == field.grid
        np.testing.assert_allclose(np.asarray(restored.data), np.asarray(field.data))


def test_get_image_and_line_data(rng):
    f2 = pde.ScalarField.random_uniform(pde.UnitGrid([6, 8]), rng=rng, label="f")
    img = f2.get_image_data()
    assert img["data"].shape == (8, 6)  # transposed for matplotlib
    assert img["title"] == "f"
    line = f2.get_line_data(extract="cut_x")
    assert line["data_x"].shape == (6,)
    proj = f2.get_line_data(extract="project_y")  # projects ONTO the y axis
    assert proj["data_x"].shape == (8,)
    # 3d central slice
    f3 = pde.ScalarField.random_uniform(pde.UnitGrid([4, 5, 6]), rng=rng)
    img3 = f3.get_image_data()
    assert img3["data"].shape == (5, 4)
    # vector image via norm
    v = pde.VectorField.random_uniform(pde.UnitGrid([6, 8]), rng=rng)
    imgv = v.get_image_data()
    assert imgv["data"].shape == (8, 6)


def test_interpolate_fill_and_errors(rng):
    grid = pde.CartesianGrid([(0, 1)], 8)
    f = pde.ScalarField.random_uniform(grid, rng=rng)
    # outside the domain raises without fill
    from pde_tpu.grids.base import DomainError

    with pytest.raises(DomainError):
        f.interpolate([[2.0]])
    # with fill it returns the fill value
    val = f.interpolate([[2.0]], fill=-7.0)
    assert float(val[0]) == -7.0
    # wrong dimensionality
    with pytest.raises(DomainError):
        f.interpolate([[0.5, 0.5]])


def test_vector_to_scalar_variants(rng):
    v = pde.VectorField.random_uniform(pde.UnitGrid([4, 4]), rng=rng)
    data = np.asarray(v.data)
    np.testing.assert_allclose(
        np.asarray(v.to_scalar("max").data), data.max(axis=0)
    )
    np.testing.assert_allclose(
        np.asarray(v.to_scalar("min").data), data.min(axis=0)
    )
    np.testing.assert_allclose(
        np.asarray(v.to_scalar(0).data), data[0]
    )
    with pytest.raises(ValueError):
        v.to_scalar("bogus")


def test_gridmesh_communication_primitives(rng):
    import jax

    from pde_tpu.parallel import GridMesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    grid = pde.UnitGrid([8, 8], periodic=True)
    mesh = GridMesh.from_grid(grid, [2, 2])
    data = rng.random((8, 8))
    sharded = mesh.scatter(data)
    np.testing.assert_allclose(mesh.gather(sharded), data)
    np.testing.assert_allclose(np.asarray(mesh.allgather(sharded)), data)
    assert mesh.broadcast(5) == 5
    np.testing.assert_allclose(
        mesh.combine_field_data(mesh.split_field_data(data)), data
    )


def test_multi_output_ufunc_rejected():
    """nout != 1 ufuncs (divmod/modf/frexp) must not produce a field whose
    .data is a tuple; the dunder returns NotImplemented so numpy raises."""
    grid = pde.UnitGrid([4])
    field = pde.ScalarField(grid, 1.5)
    with pytest.raises(TypeError):
        np.divmod(field, 2)
    with pytest.raises(TypeError):
        np.modf(field)
    # out-tuple of the wrong length falls back, too
    out = pde.ScalarField(grid, 0.0)
    result = np.add(field, 1.0, out=(out,))
    assert result is out
    np.testing.assert_allclose(np.asarray(out.data), 2.5)
