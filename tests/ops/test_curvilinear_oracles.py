"""Curvilinear operators vs closed-form analytic results.

Ports the reference's analytic curvilinear oracles
(`/root/reference/tests/backends/generic/operators/test_{polar,spherical,
cylindrical}_operators.py`).
"""

import numpy as np
import pytest

import pde_tpu as pde


# -- polar (2D rotational symmetry) --------------------------------------------------


def test_polar_laplace_r2():
    """∇²(r²) = 4 in two dimensions."""
    grid = pde.PolarSymGrid(4, 64)
    field = pde.ScalarField.from_expression(grid, "r**2")
    lap = field.laplace({"derivative": 8})  # outward derivative of r² at r=4
    np.testing.assert_allclose(np.asarray(lap.data), 4.0, rtol=1e-5)


def test_polar_gradient_analytic():
    grid = pde.PolarSymGrid(3, 64)
    field = pde.ScalarField.from_expression(grid, "r**3")
    grad = field.gradient({"derivative": 27})
    r = grid.axes_coords[0]
    # central differences on r**3 have O(h^2) absolute truncation error
    np.testing.assert_allclose(
        np.asarray(grad.data)[0][2:-2], (3 * r**2)[2:-2], atol=0.01, rtol=1e-3
    )


def test_polar_divergence_analytic():
    """div(r e_r) = 2 in 2D polar coordinates."""
    grid = pde.PolarSymGrid(3, 64)
    vf = pde.VectorField(grid, data=np.stack([grid.axes_coords[0],
                                              np.zeros(64)]))
    div = vf.divergence({"derivative": 1})
    np.testing.assert_allclose(np.asarray(div.data)[1:-1], 2.0, rtol=1e-4)


def test_polar_laplace_conservative_conserves_mass(rng):
    """The conservative flux-form Laplacian integrates to the boundary flux."""
    grid = pde.PolarSymGrid(2, 32)
    field = pde.ScalarField.random_colored(grid, exponent=-4, rng=rng)
    lap = field.laplace({"derivative": 0})
    assert abs(float(lap.integral)) < 1e-8


# -- spherical (3D rotational symmetry) ----------------------------------------------


def test_spherical_laplace_r2():
    """∇²(r²) = 6 in three dimensions."""
    grid = pde.SphericalSymGrid(4, 64)
    field = pde.ScalarField.from_expression(grid, "r**2")
    lap = field.laplace({"derivative": 8})
    np.testing.assert_allclose(np.asarray(lap.data), 6.0, rtol=1e-5)


def test_spherical_laplace_coulomb():
    """∇²(1/r) = 0 away from the origin."""
    grid = pde.SphericalSymGrid((1, 4), 64)
    field = pde.ScalarField.from_expression(grid, "1 / r")
    lap = field.laplace({"curvature": 0})
    np.testing.assert_allclose(np.asarray(lap.data)[8:-8], 0.0, atol=1e-3)


def test_spherical_divergence_analytic():
    """div(r e_r) = 3 in 3D."""
    grid = pde.SphericalSymGrid(3, 64)
    vf = pde.VectorField(
        grid, data=np.stack([grid.axes_coords[0], np.zeros(64), np.zeros(64)])
    )
    div = vf.divergence({"derivative": 1})
    np.testing.assert_allclose(np.asarray(div.data)[1:-1], 3.0, rtol=1e-4)


def test_spherical_conservative_mass(rng):
    grid = pde.SphericalSymGrid(2, 32)
    field = pde.ScalarField.random_colored(grid, exponent=-4, rng=rng)
    lap = field.laplace({"derivative": 0})
    assert abs(float(lap.integral)) < 1e-8


def test_spherical_tensor_double_divergence(rng):
    """Double divergence of an isotropic tensor r²·I has an analytic form."""
    grid = pde.SphericalSymGrid((0.5, 3), 48)
    r = grid.axes_coords[0]
    data = np.zeros((3, 3, 48))
    for i in range(3):
        data[i, i] = r**2
    tf = pde.Tensor2Field(grid, data=data)
    op = grid.make_operator("tensor_double_divergence", bc={"curvature": 2})
    res = np.asarray(op(tf.data))
    # ∇·∇·(r² I) = (1/r²) d/dr (r² d(r²)/dr) ... = ∇²(r²) = 6 for the
    # diagonal isotropic tensor
    np.testing.assert_allclose(res[4:-4], 6.0, rtol=0.05)


# -- cylindrical ----------------------------------------------------------------------


def test_cylindrical_laplace_analytic():
    """∇²(r² + z²) = 4 + 2 = 6 in cylindrical coordinates."""
    grid = pde.CylindricalSymGrid(3, (0, 2), (48, 32))
    field = pde.ScalarField.from_expression(grid, "r**2 + z**2")
    lap = field.laplace({"r": {"derivative": 6}, "z-": {"derivative": 0},
                         "z+": {"derivative": 4}})
    np.testing.assert_allclose(np.asarray(lap.data), 6.0, rtol=1e-4)


def test_cylindrical_gradient_analytic():
    grid = pde.CylindricalSymGrid(2, (0, 3), (32, 48))
    field = pde.ScalarField.from_expression(grid, "z * r**2")
    grad = field.gradient("auto_periodic_neumann")
    r = grid.axes_coords[0][:, None]
    z = grid.axes_coords[1][None, :]
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(
        np.asarray(grad.data)[0][interior], (2 * r * z * np.ones_like(z))[interior],
        rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(grad.data)[1][interior], (r**2 * np.ones_like(z))[interior],
        rtol=1e-2,
    )


def test_cylindrical_conservative_mass(rng):
    grid = pde.CylindricalSymGrid(2, (0, 2), (24, 24))
    field = pde.ScalarField.random_colored(grid, exponent=-4, rng=rng)
    lap = field.laplace({"derivative": 0})
    assert abs(float(lap.integral)) < 1e-8


# -- cross-grid consistency ------------------------------------------------------------


@pytest.mark.parametrize(
    "grid",
    [
        pde.PolarSymGrid(2, 32),
        pde.SphericalSymGrid(2, 32),
        pde.CylindricalSymGrid(2, (0, 2), (16, 16)),
    ],
    ids=["polar", "spherical", "cylindrical"],
)
def test_gradient_squared_consistency(grid, rng):
    """gradient_squared equals |gradient|² on smooth fields (interior)."""
    field = pde.ScalarField.random_colored(grid, exponent=-6, rng=rng)
    gs = field.apply_operator("gradient_squared", bc={"derivative": 0})
    grad = field.gradient({"derivative": 0})
    norm2 = sum(np.asarray(grad.data[i]) ** 2 for i in range(grad.data.shape[0]))
    sel = (slice(2, -2),) * grid.num_axes
    np.testing.assert_allclose(
        np.asarray(gs.data)[sel], norm2[sel], rtol=0.5, atol=1e-4
    )


@pytest.mark.parametrize(
    "grid",
    [
        pde.PolarSymGrid((0.5, 2), 64),
        pde.SphericalSymGrid((0.5, 2), 64),
        pde.CylindricalSymGrid(2, (0, 2), (64, 64)),
    ],
    ids=["polar", "spherical", "cylindrical"],
)
def test_laplace_equals_div_grad(grid, rng):
    """∇²f and ∇·(∇f) both converge to the analytic Laplacian of exp(-r²).

    The composition uses a wide (2h) stencil, so the two are compared via the
    analytic value rather than against each other.
    """
    field = pde.ScalarField.from_expression(grid, "exp(-r**2)")
    # radial Laplacian of exp(-r²): (4r² - 2d) e^{-r²} where d is the number
    # of dimensions the radius spans (2 for polar AND cylindrical — the z
    # term vanishes — and 3 for spherical)
    dim = 3 if isinstance(grid, pde.SphericalSymGrid) else 2
    coords = grid.cell_coords
    r = np.asarray(coords[..., 0])
    exact = (4 * r**2 - 2 * dim) * np.exp(-(r**2))
    sel = (slice(4, -4),) * grid.num_axes
    lap = field.laplace({"derivative": 0})
    divgrad = field.gradient({"derivative": 0}).divergence({"derivative": 0})
    np.testing.assert_allclose(np.asarray(lap.data)[sel], exact[sel],
                               rtol=0.05, atol=0.02)
    np.testing.assert_allclose(np.asarray(divgrad.data)[sel], exact[sel],
                               rtol=0.1, atol=0.05)
