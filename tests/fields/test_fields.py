"""Tests for the field classes (mirrors reference tests/fields/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde


def test_scalar_field_basics(rng):
    grid = pde.UnitGrid([8, 8])
    field = pde.ScalarField.random_uniform(grid, 1, 2, rng=rng, label="c")
    assert field.data.shape == (8, 8)
    assert field.label == "c"
    assert 1 <= float(field.average) <= 2
    assert float(field.integral) == pytest.approx(float(field.average) * 64)
    assert field.magnitude > 0

    # arithmetic
    f2 = field + field
    np.testing.assert_allclose(np.asarray(f2.data), 2 * np.asarray(field.data))
    f3 = 2 * field - field
    np.testing.assert_allclose(np.asarray(f3.data), np.asarray(field.data))
    f4 = field**2
    np.testing.assert_allclose(np.asarray(f4.data), np.asarray(field.data) ** 2)
    f5 = field / 2
    np.testing.assert_allclose(np.asarray(f5.data), np.asarray(field.data) / 2)


def test_field_pytree_roundtrip():
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid, 1.5, label="f")
    leaves, treedef = jax.tree_util.tree_flatten(field)
    assert len(leaves) == 1
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    assert restored == field
    assert restored.label == "f"
    # jit transparently maps over fields
    doubled = jax.jit(lambda f: f * 2)(field)
    assert float(doubled.average) == pytest.approx(3.0)


def test_field_from_expression():
    grid = pde.CartesianGrid([(0, 1), (0, 1)], 8)
    field = pde.ScalarField.from_expression(grid, "x * y + 1")
    xs, ys = grid.coordinate_arrays
    np.testing.assert_allclose(np.asarray(field.data), xs * ys + 1)


def test_vector_field(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    vf = pde.VectorField.random_uniform(grid, rng=rng)
    assert vf.data.shape == (2, 8, 8)
    norm = vf.to_scalar("norm")
    np.testing.assert_allclose(
        np.asarray(norm.data), np.linalg.norm(np.asarray(vf.data), axis=0)
    )
    # dot products
    dot = vf.dot(vf)
    np.testing.assert_allclose(
        np.asarray(dot.data), np.sum(np.asarray(vf.data) ** 2, axis=0)
    )
    outer = vf.outer_product(vf)
    assert outer.data.shape == (2, 2, 8, 8)
    # component access
    comp = vf[0]
    np.testing.assert_allclose(np.asarray(comp.data), np.asarray(vf.data[0]))
    vf["y"] = 0.0
    np.testing.assert_allclose(np.asarray(vf.data[1]), 0.0)


def test_tensor_field(rng):
    grid = pde.UnitGrid([6, 6])
    tf = pde.Tensor2Field.random_uniform(grid, rng=rng)
    assert tf.data.shape == (2, 2, 6, 6)
    tr = tf.trace()
    np.testing.assert_allclose(
        np.asarray(tr.data), np.asarray(tf.data[0, 0] + tf.data[1, 1])
    )
    sym = tf.symmetrize()
    np.testing.assert_allclose(
        np.asarray(sym.data[0, 1]), np.asarray((tf.data[0, 1] + tf.data[1, 0]) / 2)
    )
    vf = pde.VectorField.random_uniform(grid, rng=rng)
    tv = tf.dot(vf)
    assert isinstance(tv, pde.VectorField)
    expected = np.einsum("ij...,j...->i...", np.asarray(tf.data), np.asarray(vf.data))
    np.testing.assert_allclose(np.asarray(tv.data), expected)
    det = tf.to_scalar("determinant")
    expected_det = np.linalg.det(np.moveaxis(np.asarray(tf.data), (0, 1), (-2, -1)))
    np.testing.assert_allclose(np.asarray(det.data), expected_det)


def test_field_collection(rng):
    grid = pde.UnitGrid([4, 4])
    a = pde.ScalarField.random_uniform(grid, rng=rng, label="a")
    b = pde.VectorField.random_uniform(grid, rng=rng, label="b")
    col = pde.FieldCollection([a, b])
    assert len(col) == 2
    assert col.labels == ["a", "b"]
    assert col["a"] is a
    # packed data view
    assert col.data.shape == (3, 4, 4)
    # arithmetic
    col2 = col + col
    np.testing.assert_allclose(np.asarray(col2[0].data), 2 * np.asarray(a.data))
    # pytree
    col3 = jax.jit(lambda c: c * 0.5)(col)
    np.testing.assert_allclose(np.asarray(col3[1].data), np.asarray(b.data) / 2)
    # integrals / averages
    assert len(col.integrals) == 2


def test_interpolation():
    grid = pde.CartesianGrid([(0, 2 * np.pi)], 64, periodic=True)
    field = pde.ScalarField.from_expression(grid, "sin(x)")
    val = field.interpolate([[np.pi / 2]])
    assert float(val[0]) == pytest.approx(1.0, abs=1e-2)
    # vector interpolation keeps components
    vf = pde.VectorField.from_expression(
        pde.UnitGrid([8, 8], periodic=True), ["1", "2"]
    )
    vals = vf.interpolate([[4.0, 4.0]])
    np.testing.assert_allclose(np.asarray(vals)[..., 0], [1.0, 2.0])


def test_interpolate_to_grid():
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.from_expression(
        pde.CartesianGrid([(0, 16), (0, 16)], (16, 16), periodic=True), "x"
    )
    coarse = field.interpolate_to_grid(pde.UnitGrid([8, 8], periodic=True))
    assert coarse.data.shape == (8, 8)


def test_insert():
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField(grid)
    field.insert(np.array([2.0, 2.0]), 5.0)
    assert float(field.integral) == pytest.approx(5.0)


def test_smooth():
    grid = pde.UnitGrid([32], periodic=True)
    field = pde.ScalarField.random_normal(grid, rng=np.random.default_rng(0))
    smoothed = field.smooth(2.0)
    assert float(smoothed.fluctuations) < float(field.fluctuations)
    assert float(smoothed.average) == pytest.approx(float(field.average), abs=1e-10)


def test_project_and_slice():
    grid = pde.CartesianGrid([(0, 2), (0, 4)], (8, 16))
    field = pde.ScalarField.from_expression(grid, "x")
    proj = field.project("y")
    assert proj.grid.shape == (8,)
    np.testing.assert_allclose(
        np.asarray(proj.data), 4 * np.asarray(grid.axes_coords[0]), rtol=1e-12
    )
    sl = field.slice({"y": 2.0})
    assert sl.grid.shape == (8,)
    np.testing.assert_allclose(np.asarray(sl.data), grid.axes_coords[0])


def test_field_io(tmp_path):
    grid = pde.CartesianGrid([(0, 2), (0, 3)], (4, 6), periodic=[True, False])
    field = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(1), label="io")
    path = str(tmp_path / "field.h5")
    field.to_file(path)
    restored = pde.FieldBase.from_file(path)
    assert isinstance(restored, pde.ScalarField)
    assert restored.grid == grid
    assert restored.label == "io"
    np.testing.assert_allclose(np.asarray(restored.data), np.asarray(field.data))


def test_complex_fields():
    grid = pde.UnitGrid([4])
    field = pde.ScalarField(grid, 1 + 2j)
    assert field.is_complex
    np.testing.assert_allclose(np.asarray(field.real.data), 1.0)
    np.testing.assert_allclose(np.asarray(field.imag.data), 2.0)
    np.testing.assert_allclose(np.asarray(field.conjugate().data), 1 - 2j)


def test_boundary_field():
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField.from_expression(
        pde.CartesianGrid([(0, 4), (0, 4)], (4, 4)), "x"
    )
    vals = field.get_boundary_values(0, True, bc={"value": 4})
    np.testing.assert_allclose(np.asarray(vals), 4.0)


def test_random_colored(rng):
    grid = pde.UnitGrid([32, 32], periodic=True)
    field = pde.ScalarField.random_colored(grid, exponent=-4, rng=rng)
    assert np.all(np.isfinite(np.asarray(field.data)))
    # colored noise is smoother than white noise of the same scale
    white = pde.ScalarField.random_normal(grid, rng=rng)
    assert float(field.gradient_squared("periodic").average) < float(
        white.gradient_squared("periodic").average
    )
