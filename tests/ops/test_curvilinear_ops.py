"""Curvilinear operator tests against analytic oracles.

Mirrors reference tests/backends/generic/operators/test_{polar,spherical,
cylindrical}_operators.py.
"""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.utils.config import config


@pytest.fixture
def polar_grid():
    return pde.PolarSymGrid(3, 64)


@pytest.fixture
def spherical_grid():
    return pde.SphericalSymGrid(3, 64)


@pytest.fixture
def cylindrical_grid():
    return pde.CylindricalSymGrid(3, (0, 2), (48, 32))


def test_polar_grid_basics(polar_grid):
    g = polar_grid
    assert g.dim == 2
    assert g.num_axes == 1
    assert g.volume == pytest.approx(np.pi * 9)
    assert float(np.sum(np.asarray(g.cell_volumes))) == pytest.approx(g.volume)
    # serialization round trip
    g2 = pde.GridBase.from_state(g.state_serialized)
    assert g2 == g
    # grid with hole
    gh = pde.PolarSymGrid((1, 3), 32)
    assert gh.has_hole
    assert gh.volume == pytest.approx(np.pi * 8)


def test_spherical_grid_basics(spherical_grid):
    g = spherical_grid
    assert g.dim == 3
    assert g.volume == pytest.approx(4 / 3 * np.pi * 27)
    assert float(np.sum(np.asarray(g.cell_volumes))) == pytest.approx(g.volume)
    assert pde.GridBase.from_state(g.state_serialized) == g


def test_cylindrical_grid_basics(cylindrical_grid):
    g = cylindrical_grid
    assert g.dim == 3
    assert g.num_axes == 2
    assert g.volume == pytest.approx(np.pi * 9 * 2)
    assert float(np.sum(np.asarray(g.cell_volumes))) == pytest.approx(g.volume)
    assert pde.GridBase.from_state(g.state_serialized) == g
    assert g._get_boundary_index("outer") == (0, True)
    assert g._get_boundary_index("top") == (1, True)


def test_polar_laplace(polar_grid):
    field = pde.ScalarField.from_expression(polar_grid, "r**2")
    bc = {"r-": {"derivative": 0}, "r+": {"derivative": 6}}
    lap = field.laplace(bc)
    np.testing.assert_allclose(np.asarray(lap.data), 4.0, rtol=1e-10)


def test_spherical_laplace_conservative_and_naive(spherical_grid):
    field = pde.ScalarField.from_expression(spherical_grid, "r**2")
    bc = {"r-": {"derivative": 0}, "r+": {"derivative": 6}}
    lap_c = field.laplace(bc, conservative=True)
    np.testing.assert_allclose(np.asarray(lap_c.data), 6.0, rtol=1e-10)
    lap_n = field.laplace(bc, conservative=False)
    # naive stencil is exact away from the origin
    np.testing.assert_allclose(np.asarray(lap_n.data)[2:], 6.0, rtol=1e-10)


def test_spherical_conservation(spherical_grid, rng):
    """Conservative Laplacian conserves mass exactly with no-flux BCs."""
    field = pde.ScalarField.random_uniform(spherical_grid, rng=rng)
    lap = field.laplace({"derivative": 0}, conservative=True)
    assert abs(float(lap.integral)) < 1e-10


def test_cylindrical_laplace(cylindrical_grid):
    field = pde.ScalarField.from_expression(cylindrical_grid, "r**2 + z**2")
    bc = {
        "r-": {"derivative": 0},
        "r+": {"derivative": 6},
        "z": {"derivative_expression": "2*z"},
    }
    lap = field.laplace(bc)
    np.testing.assert_allclose(np.asarray(lap.data), 6.0, rtol=1e-8)


def test_polar_gradient_and_divergence(polar_grid):
    field = pde.ScalarField.from_expression(polar_grid, "r**2")
    grad = field.gradient({"r-": {"derivative": 0}, "r+": {"derivative": 6}})
    rs = polar_grid.axes_coords[0]
    np.testing.assert_allclose(np.asarray(grad.data[0]), 2 * rs, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(grad.data[1]), 0)
    # divergence of v = r e_r is 2
    v = pde.VectorField.from_expression(polar_grid, ["r", "0"])
    div = v.divergence({"r-": {"normal_derivative": -1}, "r+": {"normal_derivative": 1}})
    np.testing.assert_allclose(np.asarray(div.data), 2.0, rtol=1e-10)


def test_spherical_divergence(spherical_grid):
    v = pde.VectorField.from_expression(spherical_grid, ["r", "0", "0"])
    bc = {"r-": {"normal_derivative": -1}, "r+": {"normal_derivative": 1}}
    div_c = v.divergence(bc, conservative=True)
    np.testing.assert_allclose(np.asarray(div_c.data), 3.0, rtol=1e-10)
    div_n = v.divergence(bc, conservative=False)
    np.testing.assert_allclose(np.asarray(div_n.data), 3.0, rtol=1e-10)


def test_cylindrical_divergence_and_gradient(cylindrical_grid):
    v = pde.VectorField.from_expression(cylindrical_grid, ["r", "z", "0"])
    bc = {
        "r-": {"normal_derivative": -1},
        "r+": {"normal_derivative": 1},
        "z-": {"normal_derivative": -1},
        "z+": {"normal_derivative": 1},
    }
    div = v.divergence(bc)
    np.testing.assert_allclose(np.asarray(div.data), 3.0, rtol=1e-8)
    field = pde.ScalarField.from_expression(cylindrical_grid, "z")
    # outward normal derivatives: -1 at z-, +1 at z+
    grad = field.gradient(
        {"r": {"derivative": 0}, "z-": {"derivative": -1}, "z+": {"derivative": 1}}
    )
    np.testing.assert_allclose(np.asarray(grad.data[0]), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(grad.data[1]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(grad.data[2]), 0.0)


def test_polar_vector_gradient_tensor_divergence(polar_grid):
    # v = r e_r: grad v = diag(1, 1); div(grad v) should equal laplace(v)
    v = pde.VectorField.from_expression(polar_grid, ["r", "0"])
    bc = {"r-": {"normal_derivative": -1}, "r+": {"normal_derivative": 1}}
    t = v.gradient(bc)
    np.testing.assert_allclose(np.asarray(t.data[0, 0]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t.data[1, 1]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t.data[0, 1]), 0.0, atol=1e-12)


def test_spherical_tensor_ops(spherical_grid, rng):
    # T = grad(r e_r) = identity: div T = 0 analytically
    v = pde.VectorField.from_expression(spherical_grid, ["r", "0", "0"])
    bc = {"r-": {"normal_derivative": -1}, "r+": {"normal_derivative": 1}}
    t = v.gradient(bc)
    np.testing.assert_allclose(np.asarray(t.data[0, 0]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t.data[1, 1]), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(t.data[2, 2]), 1.0, rtol=1e-10)
    bc_t = {"derivative": 0}  # applies to all tensor components
    div = t.divergence(bc_t, conservative=False)
    np.testing.assert_allclose(np.asarray(div.data), 0.0, atol=1e-8)
    # double divergence of identity tensor vanishes
    dd = t.double_divergence(bc_t, conservative=False)
    np.testing.assert_allclose(np.asarray(dd.data), 0.0, atol=1e-8)
    dd_c = t.double_divergence(bc_t, conservative=True)
    np.testing.assert_allclose(np.asarray(dd_c.data)[1:-1], 0.0, atol=1e-8)


def test_cylindrical_vector_laplace(cylindrical_grid):
    # v = z e_z: vector laplacian vanishes
    v = pde.VectorField.from_expression(cylindrical_grid, ["0", "z", "0"])
    bc = {
        "r": {"derivative": 0},
        "z-": {"normal_derivative": -1},
        "z+": {"normal_derivative": 1},
    }
    lap = v.laplace(bc)
    np.testing.assert_allclose(np.asarray(lap.data), 0.0, atol=1e-8)


def test_diffusion_on_curvilinear_grids(rng):
    """BASELINE config 4: diffusion on SphericalSymGrid / CylindricalSymGrid."""
    for grid in [pde.SphericalSymGrid(2, 32), pde.CylindricalSymGrid(2, (0, 1), (16, 16))]:
        state = pde.ScalarField.random_uniform(grid, rng=rng)
        eq = pde.DiffusionPDE(diffusivity=0.1)
        result = eq.solve(state, t_range=1.0, dt=1e-3, tracker=None)
        assert np.all(np.isfinite(np.asarray(result.data)))
        # no-flux boundaries conserve mass
        assert float(result.integral) == pytest.approx(float(state.integral), rel=1e-8)
        # field homogenizes
        assert float(result.fluctuations) < float(state.fluctuations)


def test_conservative_stencil_config(spherical_grid, rng):
    field = pde.ScalarField.random_uniform(spherical_grid, rng=rng)
    with config({"operators.conservative_stencil": False}):
        lap_n = field.laplace({"derivative": 0})
    lap_c = field.laplace({"derivative": 0})
    # configs produce different stencils
    assert not np.allclose(np.asarray(lap_n.data), np.asarray(lap_c.data))


def test_curvilinear_image_line_data(polar_grid, cylindrical_grid, rng):
    f = pde.ScalarField.random_uniform(polar_grid, rng=rng)
    line = f.get_line_data()
    assert line["data_x"].shape == (64,)
    img = f.get_image_data()
    assert img["data"].ndim == 2
    fc = pde.ScalarField.random_uniform(cylindrical_grid, rng=rng)
    img2 = fc.get_image_data()
    assert img2["data"].shape == (32, 96)
