"""Vector- and tensor-field behaviors mirroring the reference suites
(`tests/fields/test_vectorial_fields.py`, `test_tensorial_fields.py`)."""

import numpy as np
import pytest

import pde_tpu as pde


def test_vectors_basic_components():
    grid = pde.UnitGrid([3, 3])
    v = pde.VectorField(grid, np.stack([np.full((3, 3), 1.0), np.full((3, 3), 2.0)]))
    np.testing.assert_allclose(v[0].to_numpy(), 1.0)
    np.testing.assert_allclose(v[1].to_numpy(), 2.0)
    # setting one component
    v[0] = pde.ScalarField(grid, 5.0)
    np.testing.assert_allclose(v[0].to_numpy(), 5.0)
    # norm
    np.testing.assert_allclose(v.to_scalar().to_numpy(), np.sqrt(25 + 4))


def test_divergence_analytic():
    """div([sin(x), cos(y)]) = cos(x) - sin(y) on a periodic grid."""
    grid = pde.CartesianGrid([[0, 2 * np.pi]] * 2, [64, 64], periodic=True)
    v = pde.VectorField.from_expression(grid, ["sin(x)", "cos(y)"])
    div = v.divergence("periodic")
    x, y = [np.asarray(c) for c in grid.coordinate_arrays]
    np.testing.assert_allclose(div.to_numpy(), np.cos(x) - np.sin(y), atol=5e-3)


def test_vector_gradient_analytic():
    """grad([x*y, x]) has components d_j v_i."""
    grid = pde.CartesianGrid([[0, 1], [0, 1]], [32, 32])
    v = pde.VectorField.from_expression(grid, ["x*y", "x"])
    grad = v.gradient({"derivative": 0})
    assert isinstance(grad, pde.Tensor2Field)
    x, y = [np.asarray(c) for c in grid.coordinate_arrays]
    inner = (slice(1, -1), slice(1, -1))  # interior: one-sided BC effects excluded
    np.testing.assert_allclose(grad.to_numpy()[0, 0][inner], y[inner], atol=1e-8)
    np.testing.assert_allclose(grad.to_numpy()[0, 1][inner], x[inner], atol=1e-8)
    np.testing.assert_allclose(grad.to_numpy()[1, 0][inner], 1.0, atol=1e-8)
    np.testing.assert_allclose(grad.to_numpy()[1, 1][inner], 0.0, atol=1e-8)


def test_vector_laplace_analytic():
    grid = pde.CartesianGrid([[0, 2 * np.pi]] * 2, [64, 64], periodic=True)
    v = pde.VectorField.from_expression(grid, ["sin(x)", "sin(y)"])
    lap = v.laplace("periodic")
    assert isinstance(lap, pde.VectorField)
    np.testing.assert_allclose(lap.to_numpy(), -v.to_numpy(), atol=3e-3)


def test_outer_product():
    grid = pde.UnitGrid([4, 4])
    a = pde.VectorField.from_expression(grid, ["x", "y"])
    b = pde.VectorField.from_expression(grid, ["1", "2"])
    outer = a.outer_product(b)
    assert isinstance(outer, pde.Tensor2Field)
    expected = np.einsum("i...,j...->ij...", a.to_numpy(), b.to_numpy())
    np.testing.assert_allclose(outer.to_numpy(), expected)
    # out= variant
    out = pde.Tensor2Field(grid, 0.0)
    res = a.outer_product(b, out=out)
    np.testing.assert_allclose(out.to_numpy(), expected)
    assert res is out


def test_vector_from_expression_validation():
    grid = pde.UnitGrid([3, 3])
    with pytest.raises(Exception):
        pde.VectorField.from_expression(grid, ["x"])  # wrong component count
    with pytest.raises(Exception):
        pde.VectorField.from_expression(grid, ["x", "y", "0"])


def test_dot_product_complex_conjugation(rng):
    grid = pde.UnitGrid([4, 4])
    data = rng.normal(size=(2, 4, 4)) + 1j * rng.normal(size=(2, 4, 4))
    v = pde.VectorField(grid, data)
    dot_conj = v.dot(v, conjugate=True)
    np.testing.assert_allclose(
        dot_conj.to_numpy(), np.einsum("i...,i...->...", data.conj(), data), atol=1e-12
    )
    dot_plain = v.dot(v, conjugate=False)
    np.testing.assert_allclose(
        dot_plain.to_numpy(), np.einsum("i...,i...->...", data, data), atol=1e-12
    )
    assert np.allclose(dot_conj.to_numpy().imag, 0)


def test_vector_dot_tensor(rng):
    grid = pde.UnitGrid([4, 4])
    v = pde.VectorField.random_uniform(grid, rng=rng)
    t = pde.Tensor2Field.random_uniform(grid, rng=rng)
    vt = v.dot(t)
    assert isinstance(vt, pde.VectorField)
    np.testing.assert_allclose(
        vt.to_numpy(), np.einsum("i...,ij...->j...", v.to_numpy(), t.to_numpy()),
        atol=1e-12,
    )
    tv = t.dot(v)
    np.testing.assert_allclose(
        tv.to_numpy(), np.einsum("ij...,j...->i...", t.to_numpy(), v.to_numpy()),
        atol=1e-12,
    )


def test_vector_boundary_conditions_per_axis(rng):
    """Vector operators accept per-axis BC dictionaries."""
    grid = pde.CartesianGrid([[0, 1], [0, 1]], [8, 8])
    v = pde.VectorField.random_uniform(grid, rng=rng)
    div = v.divergence({"x": {"derivative": 0}, "y": {"value": 0}})
    assert np.all(np.isfinite(div.to_numpy()))


def test_tensor_transpose_and_trace(rng):
    grid = pde.UnitGrid([4, 4])
    t = pde.Tensor2Field.random_uniform(grid, rng=rng)
    np.testing.assert_allclose(
        t.transpose.to_numpy(), np.swapaxes(t.to_numpy(), 0, 1)
    )
    np.testing.assert_allclose(
        t.trace().to_numpy(), np.einsum("ii...->...", t.to_numpy()), atol=1e-12
    )


@pytest.mark.parametrize("make_traceless", [False, True])
def test_tensor_symmetrize(make_traceless, rng):
    grid = pde.UnitGrid([4, 4])
    t = pde.Tensor2Field.random_uniform(grid, rng=rng)
    sym = t.symmetrize(make_traceless=make_traceless)
    data = sym.to_numpy()
    np.testing.assert_allclose(data, np.swapaxes(data, 0, 1), atol=1e-12)
    if make_traceless:
        np.testing.assert_allclose(np.einsum("ii...->...", data), 0, atol=1e-12)


def test_tensor_invariants_rotation_invariance(rng):
    """Tensor invariants do not change under an orthogonal rotation."""
    grid = pde.UnitGrid([4, 4])
    t = pde.Tensor2Field.random_uniform(grid, rng=rng)
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    rotated = pde.Tensor2Field(
        grid, np.einsum("ai,bj,ij...->ab...", rot, rot, t.to_numpy())
    )
    for inv in ["invariant1", "invariant2"]:
        np.testing.assert_allclose(
            t.to_scalar(inv).to_numpy(), rotated.to_scalar(inv).to_numpy(), atol=1e-10
        )


def test_insert_tensor_conserves(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    t = pde.Tensor2Field(grid, 0.0)
    amount = rng.normal(size=(2, 2))
    result = t.insert(np.array([3.7, 5.1]), amount)
    np.testing.assert_allclose(np.asarray(result.integral), amount, atol=1e-10)


def test_tensor_from_expression_validation():
    grid = pde.UnitGrid([3, 3])
    t = pde.Tensor2Field.from_expression(grid, [["x", "y"], ["0", "1"]])
    assert t.data.shape == (2, 2, 3, 3)
    with pytest.raises(Exception):
        pde.Tensor2Field.from_expression(grid, [["x"]])
    with pytest.raises(Exception):
        pde.Tensor2Field.from_expression(grid, "x")


def test_tensor_dot_tensor(rng):
    grid = pde.UnitGrid([4, 4])
    a = pde.Tensor2Field.random_uniform(grid, rng=rng)
    b = pde.Tensor2Field.random_uniform(grid, rng=rng)
    ab = a.dot(b)
    np.testing.assert_allclose(
        ab.to_numpy(),
        np.einsum("ij...,jk...->ik...", a.to_numpy(), b.to_numpy()),
        atol=1e-12,
    )


def test_complex_tensor_fields(rng):
    grid = pde.UnitGrid([3, 3])
    data = rng.normal(size=(2, 2, 3, 3)) + 1j * rng.normal(size=(2, 2, 3, 3))
    t = pde.Tensor2Field(grid, data)
    assert t.is_complex
    np.testing.assert_allclose(t.real.to_numpy(), data.real)
    np.testing.assert_allclose(t.imag.to_numpy(), data.imag)
    np.testing.assert_allclose(t.conjugate().to_numpy(), data.conj())


def test_tensor_divergence_analytic():
    """div of T=[[x,y],[x*y,x**2]] (rows i, cols j; contraction over j)."""
    grid = pde.CartesianGrid([[0, 1], [0, 1]], [48, 48])
    t = pde.Tensor2Field.from_expression(grid, [["x", "y"], ["x*y", "x**2"]])
    div = t.divergence({"normal_derivative": 0})
    assert isinstance(div, pde.VectorField)
    x, y = [np.asarray(c) for c in grid.coordinate_arrays]
    inner = (slice(1, -1), slice(1, -1))
    np.testing.assert_allclose(div.to_numpy()[0][inner], 2.0, atol=1e-8)
    np.testing.assert_allclose(div.to_numpy()[1][inner], y[inner], atol=1e-8)


def test_vector_get_vector_data_reduction(rng):
    grid = pde.UnitGrid([16, 16])
    v = pde.VectorField.random_uniform(grid, rng=rng)
    data = v.get_vector_data(max_points=8)
    assert data["data_x"].shape[0] <= 8
