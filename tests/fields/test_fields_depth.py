"""Deeper field coverage: complex dtypes, interpolation, projections,
collections, and arithmetic across all field classes.

Extends toward the reference field suites (`/root/reference/tests/fields/`).
"""

import numpy as np
import pytest

import pde_tpu as pde

FIELD_CLASSES = [pde.ScalarField, pde.VectorField, pde.Tensor2Field]


@pytest.mark.parametrize("cls", FIELD_CLASSES,
                         ids=["scalar", "vector", "tensor"])
def test_field_arithmetic(cls, rng):
    grid = pde.UnitGrid([6, 6])
    a = cls.random_uniform(grid, rng=rng)
    b = cls.random_uniform(grid, rng=rng)
    np.testing.assert_allclose(
        np.asarray((a + b).data), np.asarray(a.data) + np.asarray(b.data)
    )
    np.testing.assert_allclose(
        np.asarray((2.5 * a - b).data),
        2.5 * np.asarray(a.data) - np.asarray(b.data),
    )
    np.testing.assert_allclose(np.asarray((a / 2).data), np.asarray(a.data) / 2)
    c = a.copy()
    assert c == a and c is not a


@pytest.mark.parametrize("cls", FIELD_CLASSES,
                         ids=["scalar", "vector", "tensor"])
def test_field_complex_dtype(cls, rng):
    grid = pde.UnitGrid([4, 4])
    real = rng.random((2,) * cls.rank + (4, 4))
    imag = rng.random((2,) * cls.rank + (4, 4))
    field = cls(grid, data=real + 1j * imag)
    assert field.is_complex
    np.testing.assert_allclose(np.asarray(field.real.data), real)
    np.testing.assert_allclose(np.asarray(field.imag.data), imag)
    conj = field.conjugate()
    np.testing.assert_allclose(np.asarray(conj.data), real - 1j * imag)


def test_complex_scalar_operations(rng):
    grid = pde.UnitGrid([8], periodic=True)
    field = pde.ScalarField(grid, data=rng.random(8) + 1j * rng.random(8))
    lap = field.laplace("periodic")
    assert lap.is_complex
    # laplace acts independently on real/imag parts
    np.testing.assert_allclose(
        np.asarray(lap.data),
        np.asarray(field.real.laplace("periodic").data)
        + 1j * np.asarray(field.imag.laplace("periodic").data),
        atol=1e-12,
    )
    assert isinstance(complex(field.integral), complex)


def test_interpolation_linear_exact(rng):
    """Linear interpolation is exact for linear fields."""
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (16, 16))
    field = pde.ScalarField.from_expression(grid, "2 * x + 3 * y")
    pts = rng.uniform([0.1, 0.2], [0.9, 1.8], size=(12, 2))
    values = np.asarray(field.interpolate(pts))
    np.testing.assert_allclose(values, 2 * pts[:, 0] + 3 * pts[:, 1],
                               rtol=1e-10)


def test_interpolate_to_grid(rng):
    grid_a = pde.CartesianGrid([(0, 1)], 32)
    grid_b = pde.CartesianGrid([(0, 1)], 17)
    field = pde.ScalarField.from_expression(grid_a, "x**2")
    coarse = field.interpolate_to_grid(grid_b)
    exact = pde.ScalarField.from_expression(grid_b, "x**2")
    np.testing.assert_allclose(np.asarray(coarse.data),
                               np.asarray(exact.data), atol=2e-3)


def test_scalar_project_and_slice(rng):
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (8, 6))
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    projected = field.project("y")
    assert projected.grid.num_axes == 1
    np.testing.assert_allclose(
        np.asarray(projected.data),
        np.asarray(field.data).sum(axis=1) * grid.discretization[1],
        rtol=1e-10,
    )
    sliced = field.slice({"y": 1.0})
    assert sliced.grid.num_axes == 1
    assert sliced.data.shape == (8,)


def test_vector_dot_and_outer(rng):
    grid = pde.UnitGrid([5, 5])
    a = pde.VectorField.random_uniform(grid, rng=rng)
    b = pde.VectorField.random_uniform(grid, rng=rng)
    dot = a.dot(b)
    assert isinstance(dot, pde.ScalarField)
    np.testing.assert_allclose(
        np.asarray(dot.data),
        np.einsum("i...,i...->...", np.asarray(a.data), np.asarray(b.data)),
        rtol=1e-12,
    )
    outer = a.outer_product(b)
    assert isinstance(outer, pde.Tensor2Field)
    np.testing.assert_allclose(
        np.asarray(outer.data),
        np.einsum("i...,j...->ij...", np.asarray(a.data), np.asarray(b.data)),
        rtol=1e-12,
    )


def test_tensor_invariants(rng):
    grid = pde.UnitGrid([4, 4])
    t = pde.Tensor2Field.random_uniform(grid, rng=rng)
    data = np.asarray(t.data)
    np.testing.assert_allclose(
        np.asarray(t.to_scalar("trace").data), np.trace(data), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(t.to_scalar("determinant").data),
        np.linalg.det(np.moveaxis(data, (0, 1), (-2, -1))),
        rtol=1e-10,
    )
    tt = t.transpose
    np.testing.assert_allclose(np.asarray(tt.data),
                               np.swapaxes(data, 0, 1), rtol=1e-12)


def test_field_collection_packed_data(rng):
    grid = pde.UnitGrid([4, 4])
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.VectorField.random_uniform(grid, rng=rng, label="v")
    fc = pde.FieldCollection([u, v])
    assert fc.labels == ["u", "v"]
    assert fc["u"] == fc[0]
    packed = np.asarray(fc.data)
    assert packed.shape[0] == 1 + 2  # scalar + 2 vector components
    avg = fc.averages
    assert len(avg) == 2


def test_field_collection_from_scalar_expressions():
    grid = pde.CartesianGrid([(0, 1)], 8)
    fc = pde.FieldCollection.from_scalar_expressions(grid, ["x", "x**2"])
    np.testing.assert_allclose(
        np.asarray(fc[1].data), np.asarray(fc[0].data) ** 2, rtol=1e-12
    )


def test_field_hdf5_roundtrip(rng, tmp_path):
    path = tmp_path / "field.h5"
    grid = pde.CylindricalSymGrid(2, (0, 3), (6, 8))
    field = pde.VectorField.random_uniform(grid, rng=rng, label="flow")
    field.to_file(str(path))
    restored = pde.FieldBase.from_file(str(path))
    assert isinstance(restored, pde.VectorField)
    assert restored.grid == grid
    assert restored.label == "flow"
    np.testing.assert_allclose(np.asarray(restored.data),
                               np.asarray(field.data))


def test_scalar_from_image(tmp_path, rng):
    import matplotlib.pyplot as plt

    path = tmp_path / "img.png"
    plt.imsave(path, rng.random((8, 12)), cmap="gray")
    field = pde.ScalarField.from_image(str(path))
    assert field.grid.num_axes == 2


def test_smooth_preserves_mean(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    smoothed = field.smooth(sigma=2.0)
    assert float(smoothed.average) == pytest.approx(float(field.average),
                                                    rel=1e-6)
    assert float(smoothed.fluctuations) < float(field.fluctuations)


def test_boundary_field_extraction(rng):
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (8, 6))
    field = pde.ScalarField.from_expression(grid, "x + y")
    bf = field.get_boundary_field("x-")
    assert bf.grid.num_axes == 1
    assert bf.data.shape == (6,)
    # boundary values of x+y near x=0 equal y up to O(dx)
    np.testing.assert_allclose(
        np.asarray(bf.data), grid.axes_coords[1], atol=grid.discretization[0]
    )
