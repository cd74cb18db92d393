"""Generic field behaviors across field classes (second depth pass).

Covers the behaviors of the reference's `tests/fields/test_generic_fields.py`
that the first two depth files do not: label validation, ufunc support,
randomness statistics/reproducibility, smoothing oracles, projections,
boundary values, and cross-grid interpolation.
"""

import numpy as np
import pytest
from scipy import ndimage

import pde_tpu as pde
from pde_tpu.fields.datafield_base import DataFieldBase

FIELD_CLASSES = [pde.ScalarField, pde.VectorField, pde.Tensor2Field]


@pytest.mark.parametrize("field_class", FIELD_CLASSES)
def test_label_validation(field_class, rng):
    grid = pde.UnitGrid([4, 4])
    field = field_class.random_uniform(grid, label="name", rng=rng)
    assert field.label == "name"
    field.label = "new"
    assert field.label == "new"
    field.label = None
    assert field.label is None
    with pytest.raises(TypeError):
        field.label = 3


@pytest.mark.parametrize("field_class", FIELD_CLASSES)
def test_arithmetic_per_class(field_class, rng):
    grid = pde.UnitGrid([5, 4])
    a = field_class.random_uniform(grid, rng=rng)
    b = field_class.random_uniform(grid, rng=rng)
    np.testing.assert_allclose((a + b).to_numpy(), a.to_numpy() + b.to_numpy())
    np.testing.assert_allclose((a - b).to_numpy(), a.to_numpy() - b.to_numpy())
    np.testing.assert_allclose((2 * a).to_numpy(), 2 * a.to_numpy())
    np.testing.assert_allclose((a * 2).to_numpy(), (2 * a).to_numpy())
    np.testing.assert_allclose((a / 2).to_numpy(), a.to_numpy() / 2)
    np.testing.assert_allclose((-a).to_numpy(), -a.to_numpy())
    # fields on different grids are incompatible
    other = field_class.random_uniform(pde.UnitGrid([4, 4]), rng=rng)
    with pytest.raises((ValueError, RuntimeError)):
        a + other


def test_numpy_ufuncs(rng):
    grid = pde.UnitGrid([2, 2])
    f1 = pde.ScalarField.random_uniform(grid, 0.1, 0.9, rng=rng)

    f2 = np.sin(f1)
    assert isinstance(f2, pde.ScalarField)
    np.testing.assert_allclose(f2.to_numpy(), np.sin(f1.to_numpy()))

    out = f1.copy()
    res = np.sin(f1, out=out)
    assert res is out
    np.testing.assert_allclose(out.to_numpy(), np.sin(f1.to_numpy()))

    np.testing.assert_allclose(np.add(f1, 2).to_numpy(), f1.to_numpy() + 2)
    np.testing.assert_allclose(
        np.multiply(f1, f1).to_numpy(), f1.to_numpy() ** 2
    )

    with pytest.raises(TypeError):
        np.sum(f1, 1)  # reductions are not ufunc calls


def test_to_scalar_variants(rng):
    sf = pde.ScalarField.random_uniform(pde.UnitGrid([3, 3]), -1, 1, rng=rng)
    # `auto` keeps real data unchanged (including signs)
    np.testing.assert_allclose(sf.to_scalar().to_numpy(), sf.to_numpy())
    np.testing.assert_allclose(sf.to_scalar("norm_squared").to_numpy(), sf.to_numpy() ** 2)
    np.testing.assert_allclose(sf.to_scalar(lambda x: 2 * x).to_numpy(), 2 * sf.to_numpy())

    data = rng.uniform(size=(3, 3)) + 1j * rng.uniform(size=(3, 3))
    cf = pde.ScalarField(pde.UnitGrid([3, 3]), data)
    np.testing.assert_allclose(cf.to_scalar().to_numpy(), np.abs(data))
    np.testing.assert_allclose(
        cf.to_scalar("abs").to_numpy(), cf.to_scalar("norm").to_numpy()
    )
    np.testing.assert_allclose(cf.to_scalar("norm_squared").to_numpy(), np.abs(data) ** 2)

    with pytest.raises(ValueError):
        sf.to_scalar("nonsense")


@pytest.mark.parametrize("method", ["integral", "average", "max", "min"])
def test_projection_methods(method, rng):
    grid = pde.CartesianGrid([[0, 2], [0, 4]], [8, 16])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    proj = field.project("y", method=method)
    data = field.to_numpy()
    dy = grid.discretization[1]
    if method == "integral":
        expected = data.sum(axis=1) * dy
    elif method == "average":
        expected = data.sum(axis=1) * dy / 4
    elif method == "max":
        expected = data.max(axis=1)
    else:
        expected = data.min(axis=1)
    np.testing.assert_allclose(proj.to_numpy(), expected)
    with pytest.raises(ValueError):
        field.project("y", method="bogus")


def test_random_uniform_statistics(rng):
    grid = pde.UnitGrid([64, 64])
    field = pde.ScalarField.random_uniform(grid, 2.0, 3.0, rng=rng)
    assert 2.0 <= float(field.to_numpy().min())
    assert float(field.to_numpy().max()) <= 3.0
    assert abs(float(field.average) - 2.5) < 0.05


@pytest.mark.parametrize("field_class", FIELD_CLASSES)
def test_random_normal_statistics(field_class, rng):
    grid = pde.UnitGrid([32, 32])
    field = field_class.random_normal(grid, mean=1.5, std=0.3, rng=rng)
    assert abs(float(np.mean(field.to_numpy())) - 1.5) < 0.05
    assert abs(float(np.std(field.to_numpy())) - 0.3) < 0.05


def test_random_reproducibility():
    grid = pde.UnitGrid([8, 8])
    f1 = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(7))
    f2 = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(7))
    np.testing.assert_array_equal(f1.to_numpy(), f2.to_numpy())
    f3 = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(8))
    assert not np.array_equal(f1.to_numpy(), f3.to_numpy())


def test_fluctuations_scaling(rng):
    grid = pde.CartesianGrid([[0, 1]], [1024])
    for std in (0.5, 2.0):
        field = pde.ScalarField.random_normal(grid, mean=3.0, std=std, rng=rng)
        assert abs(float(field.fluctuations) - std) < 0.2 * std


def test_smoothing_oracle_periodic(rng):
    grid = pde.UnitGrid([16, 16], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    smoothed = field.smooth(1.5)
    oracle = ndimage.gaussian_filter(field.to_numpy(), 1.5, mode="wrap")
    np.testing.assert_allclose(smoothed.to_numpy(), oracle, atol=1e-12)


def test_smoothing_oracle_nonperiodic(rng):
    grid = pde.UnitGrid([16, 16])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    smoothed = field.smooth(1.5)
    oracle = ndimage.gaussian_filter(field.to_numpy(), 1.5, mode="nearest")
    np.testing.assert_allclose(smoothed.to_numpy(), oracle, atol=1e-12)


def test_smoothing_mixed_periodicity(rng):
    grid = pde.CartesianGrid([[0, 8], [0, 8]], [16, 16], periodic=[True, False])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    sigma = 1.0
    # physical smoothing scale: sigma is in grid units of length
    sigma_cells = sigma / grid.discretization[0]
    oracle = ndimage.gaussian_filter1d(field.to_numpy(), sigma_cells, axis=0, mode="wrap")
    oracle = ndimage.gaussian_filter1d(oracle, sigma_cells, axis=1, mode="nearest")
    np.testing.assert_allclose(field.smooth(sigma).to_numpy(), oracle, atol=1e-12)


def test_get_class_by_rank():
    assert DataFieldBase.get_class_by_rank(0) is pde.ScalarField
    assert DataFieldBase.get_class_by_rank(1) is pde.VectorField
    assert DataFieldBase.get_class_by_rank(2) is pde.Tensor2Field
    with pytest.raises(TypeError):  # RankError subclasses TypeError
        DataFieldBase.get_class_by_rank(3)


def test_random_harmonic_smoothness(rng):
    grid = pde.CartesianGrid([[0, 8], [0, 8]], [32, 32])
    field = pde.ScalarField.random_harmonic(grid, modes=3, rng=rng)
    assert field.data.shape == (32, 32)
    # harmonic fields are superpositions of a few long modes: the cell-to-cell
    # difference must be far below the overall amplitude
    data = field.to_numpy()
    amplitude = np.abs(data).max()
    step = max(np.abs(np.diff(data, axis=0)).max(), np.abs(np.diff(data, axis=1)).max())
    assert step < amplitude


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_interpolate_to_same_grid_identity(ndim, rng):
    grid = pde.UnitGrid([6] * ndim, periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    same = field.interpolate_to_grid(grid)
    np.testing.assert_allclose(same.to_numpy(), field.to_numpy(), atol=1e-12)


@pytest.mark.parametrize(
    "grid",
    [
        pde.PolarSymGrid(4.0, 16),
        pde.SphericalSymGrid(4.0, 16),
        pde.CylindricalSymGrid(4.0, (-2, 2), (8, 8)),
    ],
)
def test_interpolation_to_cartesian(grid, rng):
    """Constant fields stay constant when re-gridded through Cartesian coords."""
    field = pde.ScalarField(grid, 3.5)
    cart = grid.get_cartesian_grid(mode="valid")
    result = field.interpolate_to_grid(cart, fill=np.nan)
    values = result.to_numpy()
    inside = ~np.isnan(values)
    assert inside.any()
    np.testing.assert_allclose(values[inside], 3.5, atol=1e-8)


@pytest.mark.parametrize(
    "grid",
    [
        pde.PolarSymGrid(4.0, 8),
        pde.SphericalSymGrid(4.0, 8),
        pde.CylindricalSymGrid(4.0, (-2, 2), (4, 4)),
    ],
)
def test_get_cartesian_grid(grid):
    cart = grid.get_cartesian_grid(mode="valid")
    assert cart.volume <= grid.volume + 1e-12
    cart = grid.get_cartesian_grid(mode="full")
    assert cart.volume >= grid.volume - 1e-12


def test_boundary_values_constant_bc(rng):
    grid = pde.UnitGrid([4, 4])
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    # Dirichlet value dominates the boundary average of ghost and edge cell
    bv = field.get_boundary_values(axis=0, upper=True, bc={"value": 2.0})
    np.testing.assert_allclose(np.asarray(bv), 2.0, atol=1e-12)
    # derivative=0: boundary value equals the edge cell value
    bv = field.get_boundary_values(axis=1, upper=False, bc={"derivative": 0.0})
    np.testing.assert_allclose(np.asarray(bv), field.to_numpy()[:, 0], atol=1e-12)


@pytest.mark.parametrize("field_class", FIELD_CLASSES)
def test_plot_writes_image(field_class, tmp_path, rng):
    import matplotlib

    matplotlib.use("Agg")
    grid = pde.UnitGrid([4, 4])
    field = field_class.random_uniform(grid, rng=rng)
    path = tmp_path / "field.png"
    if field_class is pde.Tensor2Field:
        field.plot_components(filename=str(path))
    else:
        field.plot(filename=str(path))
    assert path.stat().st_size > 0


def test_interpolation_singular_grid():
    """A single-cell grid interpolates to its constant value."""
    grid = pde.UnitGrid([1, 1])
    field = pde.ScalarField(grid, 4.2)
    value = field.interpolate(np.array([0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(value), 4.2)


def test_insert_conserves_integral_polar(rng):
    grid = pde.PolarSymGrid(5.0, 16)
    field = pde.ScalarField(grid, 0.0)
    result = field.insert(np.array([2.3]), 1.7)
    np.testing.assert_allclose(float(result.integral), 1.7, rtol=1e-10)


def test_average_and_integral_weighted():
    """Averages use cell volumes (non-trivial on curvilinear grids)."""
    grid = pde.SphericalSymGrid(2.0, 32)
    field = pde.ScalarField(grid, 3.0)
    np.testing.assert_allclose(float(field.average), 3.0, rtol=1e-12)
    np.testing.assert_allclose(float(field.integral), 3.0 * grid.volume, rtol=1e-12)
