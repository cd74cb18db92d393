"""Cross-implementation parity: run the ACTUAL reference package (pure Python,
jax backend, CPU fp64) side by side with pde_tpu on identical data.

The reference at /root/reference is imported read-only under its own package
name (`pde`); every test feeds both frameworks the same numpy arrays and
asserts the outputs agree to fp64 tolerance. This is the strongest parity
oracle available: not a re-derived expectation, the reference itself.

Skipped automatically when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

if not os.path.isdir(os.path.join(REFERENCE_PATH, "pde")):
    pytest.skip("reference package not available", allow_module_level=True)

sys.path.insert(0, REFERENCE_PATH)
refpde = pytest.importorskip("pde")

import pde_tpu  # noqa: E402

TOL = dict(rtol=1e-10, atol=1e-10)


def _pair_grids(kind):
    """Return (reference grid, pde_tpu grid) of the same geometry."""
    if kind == "cart1":
        return (
            refpde.CartesianGrid([[0, 2]], [16], periodic=True),
            pde_tpu.CartesianGrid([[0, 2]], [16], periodic=True),
        )
    if kind == "cart2":
        return (
            refpde.CartesianGrid([[0, 2], [0, 1]], [8, 12], periodic=[True, False]),
            pde_tpu.CartesianGrid([[0, 2], [0, 1]], [8, 12], periodic=[True, False]),
        )
    if kind == "cart3":
        return (
            refpde.UnitGrid([4, 6, 8], periodic=True),
            pde_tpu.UnitGrid([4, 6, 8], periodic=True),
        )
    if kind == "polar":
        return refpde.PolarSymGrid(3.0, 16), pde_tpu.PolarSymGrid(3.0, 16)
    if kind == "spherical":
        return refpde.SphericalSymGrid(3.0, 16), pde_tpu.SphericalSymGrid(3.0, 16)
    if kind == "cylindrical":
        return (
            refpde.CylindricalSymGrid(2.0, (0, 3), (8, 12)),
            pde_tpu.CylindricalSymGrid(2.0, (0, 3), (8, 12)),
        )
    raise ValueError(kind)


def _bc_for(kind, spec):
    """BC specs shared by both frameworks."""
    if spec == "auto":
        return "auto_periodic_neumann"
    if spec == "value":
        if kind == "cart2":
            return {"x": "periodic", "y": {"value": 1.5}}
        return {"value": 1.5}
    return spec


CART_KINDS = ["cart1", "cart2", "cart3"]
CURV_KINDS = ["polar", "spherical", "cylindrical"]


@pytest.mark.parametrize("kind", CART_KINDS + CURV_KINDS)
@pytest.mark.parametrize("op", ["laplace", "gradient", "gradient_squared"])
def test_scalar_operator_parity(kind, op, rng):
    ref_grid, tpu_grid = _pair_grids(kind)
    data = rng.normal(size=ref_grid.shape)
    bc = _bc_for(kind, "auto")

    ref_field = refpde.ScalarField(ref_grid, data)
    ref_out = getattr(ref_field, op)(bc, backend="jax")
    tpu_field = pde_tpu.ScalarField(tpu_grid, data)
    tpu_out = getattr(tpu_field, op)(bc)

    np.testing.assert_allclose(
        tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL,
        err_msg=f"{op} disagrees with the reference on {kind}",
    )


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_scalar_operator_parity_dirichlet(ndim, rng):
    ref_grid = refpde.CartesianGrid([[0, 2]] * ndim, [6] * ndim)
    tpu_grid = pde_tpu.CartesianGrid([[0, 2]] * ndim, [6] * ndim)
    data = rng.normal(size=ref_grid.shape)
    bc = {"value": 1.5}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


def test_dirichlet_on_periodic_axis_rejected_like_reference():
    """Both frameworks reject value BCs on periodic axes the same way."""
    data = np.zeros(16)
    with pytest.raises(Exception, match="[Pp]eriodic"):
        refpde.ScalarField(
            refpde.CartesianGrid([[0, 2]], [16], periodic=True), data
        ).laplace({"value": 1.5}, backend="jax")
    with pytest.raises(Exception, match="[Pp]eriodic"):
        pde_tpu.ScalarField(
            pde_tpu.CartesianGrid([[0, 2]], [16], periodic=True), data
        ).laplace({"value": 1.5})


@pytest.mark.parametrize("kind", CART_KINDS + CURV_KINDS)
def test_vector_divergence_parity(kind, rng):
    ref_grid, tpu_grid = _pair_grids(kind)
    dim = ref_grid.dim
    data = rng.normal(size=(dim,) + ref_grid.shape)
    bc = "auto_periodic_neumann"

    ref_out = refpde.VectorField(ref_grid, data).divergence(bc, backend="jax")
    tpu_out = pde_tpu.VectorField(tpu_grid, data).divergence(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


@pytest.mark.parametrize("kind", ["cart2", "cart3", "polar", "spherical", "cylindrical"])
def test_vector_gradient_parity(kind, rng):
    ref_grid, tpu_grid = _pair_grids(kind)
    dim = ref_grid.dim
    data = rng.normal(size=(dim,) + ref_grid.shape)
    bc = "auto_periodic_neumann"

    ref_out = refpde.VectorField(ref_grid, data).gradient(bc, backend="jax")
    tpu_out = pde_tpu.VectorField(tpu_grid, data).gradient(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


@pytest.mark.parametrize("kind", ["cart2", "polar", "spherical", "cylindrical"])
def test_tensor_divergence_parity(kind, rng):
    ref_grid, tpu_grid = _pair_grids(kind)
    dim = ref_grid.dim
    data = rng.normal(size=(dim, dim) + ref_grid.shape)
    data = (data + np.swapaxes(data, 0, 1)) / 2  # symmetric (curvilinear checks)
    bc = "auto_periodic_neumann"

    ref_out = refpde.Tensor2Field(ref_grid, data).divergence(bc, backend="jax")
    # the reference's JAX backend implements only the non-conservative
    # curvilinear stencils (its conservative flux forms exist in the numba
    # backend only); select the matching form for the comparison
    with pde_tpu.config({"operators.conservative_stencil": False}):
        tpu_out = pde_tpu.Tensor2Field(tpu_grid, data).divergence(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


@pytest.mark.parametrize(
    "expression",
    [
        "laplace(c)",
        "laplace(c**3 - c - laplace(c))",
        "-c * laplace(c) + gradient_squared(c) / 2",
        "-laplace(c + laplace(c)) - gradient_squared(c) / 2",
    ],
)
def test_expression_pde_rhs_parity(expression, rng):
    """The sympy → compiled-rhs pipeline of both frameworks agrees."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)

    ref_eq = refpde.PDE({"c": expression})
    ref_rhs = ref_eq.make_pde_rhs(refpde.ScalarField(ref_grid, data), backend="jax")
    ref_out = np.asarray(ref_rhs(data.copy(), 0.0))

    tpu_eq = pde_tpu.PDE({"c": expression})
    tpu_out = tpu_eq.evolution_rate(pde_tpu.ScalarField(tpu_grid, data), 0.0)

    np.testing.assert_allclose(tpu_out.to_numpy(), ref_out, **TOL)


@pytest.mark.parametrize(
    "make_pdes",
    [
        lambda: (refpde.DiffusionPDE(0.7), pde_tpu.DiffusionPDE(0.7)),
        lambda: (refpde.CahnHilliardPDE(1.3), pde_tpu.CahnHilliardPDE(1.3)),
        lambda: (
            refpde.KuramotoSivashinskyPDE(1.1),
            pde_tpu.KuramotoSivashinskyPDE(1.1),
        ),
        lambda: (
            refpde.SwiftHohenbergPDE(0.5, 1.1, 0.2),
            pde_tpu.SwiftHohenbergPDE(0.5, 1.1, 0.2),
        ),
        lambda: (refpde.AllenCahnPDE(0.9), pde_tpu.AllenCahnPDE(0.9)),
        lambda: (refpde.KPZInterfacePDE(0.8, 0.6), pde_tpu.KPZInterfacePDE(0.8, 0.6)),
    ],
    ids=["diffusion", "cahn-hilliard", "kuramoto-sivashinsky", "swift-hohenberg",
         "allen-cahn", "kpz"],
)
def test_predefined_pde_rhs_parity(make_pdes, rng):
    ref_eq, tpu_eq = make_pdes()
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)

    ref_rhs = ref_eq.make_pde_rhs(refpde.ScalarField(ref_grid, data), backend="jax")
    ref_out = np.asarray(ref_rhs(data.copy(), 0.0))
    tpu_out = tpu_eq.evolution_rate(pde_tpu.ScalarField(tpu_grid, data), 0.0)
    np.testing.assert_allclose(tpu_out.to_numpy(), ref_out, **TOL)


def test_wave_pde_rhs_parity(rng):
    """2-field wave system: compare against the hand-built reference rhs.

    The reference's own jax backend cannot trace its WavePDE rhs
    (`pdes/wave.py:131` converts a traced FieldCollection to numpy —
    TracerArrayConversionError under jit), so the oracle here is the wave
    equations composed from reference-parity operators instead.
    """
    ref_grid, tpu_grid = _pair_grids("cart2")
    u = rng.normal(size=ref_grid.shape)
    v = rng.normal(size=ref_grid.shape)
    speed2 = 0.8**2

    ref_lap_u = refpde.ScalarField(ref_grid, u).laplace(
        "auto_periodic_neumann", backend="jax"
    )
    expected = np.stack([v, speed2 * np.asarray(ref_lap_u.data)])

    tpu_state = pde_tpu.FieldCollection(
        [pde_tpu.ScalarField(tpu_grid, u), pde_tpu.ScalarField(tpu_grid, v)]
    )
    tpu_out = pde_tpu.WavePDE(0.8).evolution_rate(tpu_state, 0.0)
    np.testing.assert_allclose(np.asarray(tpu_out.data), expected, **TOL)


def test_full_solve_trajectory_parity(rng):
    """Fixed-dt explicit Euler trajectories match step for step."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.uniform(size=ref_grid.shape)

    ref_res = refpde.DiffusionPDE(0.4).solve(
        refpde.ScalarField(ref_grid, data), t_range=0.5, dt=0.01,
        backend="jax", solver="explicit", tracker=None,
    )
    tpu_res = pde_tpu.DiffusionPDE(0.4).solve(
        pde_tpu.ScalarField(tpu_grid, data), t_range=0.5, dt=0.01,
        solver="euler", adaptive=False, tracker=None,
    )
    np.testing.assert_allclose(tpu_res.to_numpy(), np.asarray(ref_res.data), **TOL)


def test_integral_and_average_parity(rng):
    for kind in CART_KINDS + CURV_KINDS:
        ref_grid, tpu_grid = _pair_grids(kind)
        data = rng.normal(size=ref_grid.shape)
        ref_field = refpde.ScalarField(ref_grid, data)
        tpu_field = pde_tpu.ScalarField(tpu_grid, data)
        np.testing.assert_allclose(
            float(tpu_field.integral), float(ref_field.integral), **TOL,
            err_msg=f"integral disagrees on {kind}",
        )
        np.testing.assert_allclose(
            float(tpu_field.average), float(ref_field.average), **TOL,
            err_msg=f"average disagrees on {kind}",
        )


def test_interpolation_parity(rng):
    """The reference's interpolator requires numba (absent here), so the
    oracle is its documented semantics: N-linear interpolation on cell
    centers, checked via exact reproduction of a multilinear function."""
    tpu_grid = pde_tpu.CartesianGrid([[0, 2], [0, 1]], [8, 12])
    field = pde_tpu.ScalarField.from_expression(tpu_grid, "2*x*y + x - 3*y + 1")
    points = np.column_stack(
        [rng.uniform(0.2, 1.8, size=20), rng.uniform(0.1, 0.9, size=20)]
    )
    values = np.asarray(field.interpolate(points))
    expected = 2 * points[:, 0] * points[:, 1] + points[:, 0] - 3 * points[:, 1] + 1
    np.testing.assert_allclose(values, expected, **TOL)


def test_ghost_cell_parity(rng):
    """Full data (ghost layers included) matches the reference's BC setters."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    bc = {"x": "periodic", "y-": {"value": 2.0}, "y+": {"derivative": -1.0}}

    ref_field = refpde.ScalarField(ref_grid, data)
    ref_field.set_ghost_cells(bc)
    tpu_full = np.asarray(pde_tpu.ScalarField(tpu_grid, data).get_full_data(bc))
    ref_full = np.array(ref_field._data_full)
    # the reference leaves the four ghost CORNERS uninitialized (stencils
    # never read them); compare everything else
    interior_rows = slice(1, -1)
    np.testing.assert_allclose(tpu_full[interior_rows, :], ref_full[interior_rows, :], **TOL)
    np.testing.assert_allclose(tpu_full[:, 1:-1], ref_full[:, 1:-1], **TOL)


@pytest.mark.parametrize("kind", ["cart2", "cart3", "cylindrical"])
def test_vector_laplace_parity(kind, rng):
    ref_grid, tpu_grid = _pair_grids(kind)
    dim = ref_grid.dim
    data = rng.normal(size=(dim,) + ref_grid.shape)
    bc = "auto_periodic_neumann"

    ref_out = refpde.VectorField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.VectorField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


@pytest.mark.parametrize("central", [True, False])
def test_gradient_squared_central_flag_parity(central, rng):
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    bc = "auto_periodic_neumann"

    ref_out = refpde.ScalarField(ref_grid, data).gradient_squared(
        bc, backend="jax", central=central
    )
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).gradient_squared(bc, central=central)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


def test_expression_bc_parity(rng):
    """Space-dependent expression BC values produce identical ghost effects."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    bc = {"x": "periodic", "y": {"value_expression": "sin(x)"}}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


def test_mixed_bc_parity(rng):
    """Robin (mixed) BCs agree with the reference."""
    ref_grid = refpde.CartesianGrid([[0, 1]], [16])
    tpu_grid = pde_tpu.CartesianGrid([[0, 1]], [16])
    data = rng.normal(size=ref_grid.shape)
    bc = {"type": "mixed", "value": 2.0, "const": 0.5}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


def test_curvature_bc_parity(rng):
    ref_grid = refpde.CartesianGrid([[0, 1]], [16])
    tpu_grid = pde_tpu.CartesianGrid([[0, 1]], [16])
    data = rng.normal(size=ref_grid.shape)
    bc = {"curvature": 1.5}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


def test_rk4_solve_trajectory_parity(rng):
    """Fixed-dt RK4 trajectories match step for step."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.uniform(size=ref_grid.shape)

    ref_res = refpde.AllenCahnPDE(0.3).solve(
        refpde.ScalarField(ref_grid, data), t_range=0.2, dt=0.01,
        backend="jax", solver="runge-kutta", adaptive=False, tracker=None,
    )
    tpu_res = pde_tpu.AllenCahnPDE(0.3).solve(
        pde_tpu.ScalarField(tpu_grid, data), t_range=0.2, dt=0.01,
        solver="runge-kutta", adaptive=False, tracker=None,
    )
    np.testing.assert_allclose(tpu_res.to_numpy(), np.asarray(ref_res.data), **TOL)


def test_inhomogeneous_value_bc_array_parity(rng):
    """Array-valued Dirichlet BCs (per boundary point) agree."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    values = np.linspace(0.0, 1.0, ref_grid.shape[0])
    bc = {"x": "periodic", "y-": {"value": values}, "y+": {"derivative": 0}}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL)


def test_mixed_bc_array_factor_parity(rng):
    """Robin BCs with PER-POINT gamma/beta arrays agree with the reference
    (its virtual-point data is per-point arrays, `local.py:1541-2104`)."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    gam = rng.uniform(0.5, 2.0, ref_grid.shape[0])
    beta = rng.uniform(-1.0, 1.0, ref_grid.shape[0])
    bc = {"x": "periodic",
          "y-": {"type": "mixed", "value": gam, "const": beta},
          "y+": {"derivative": 0}}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(
        tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL
    )


def test_virtual_point_bc_parity(rng):
    """The raw virtual_point target (ghost set directly from an expression
    of coordinates) agrees with the reference."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    bc = {"x": "periodic", "y": {"virtual_point": "2 * sin(x)"}}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(
        tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL
    )


def test_mixed_expression_bc_parity(rng):
    """mixed_expression (Robin from expressions) agrees with the reference."""
    ref_grid, tpu_grid = _pair_grids("cart2")
    data = rng.normal(size=ref_grid.shape)
    bc = {"x": "periodic",
          "y": {"type": "mixed_expression", "value": "2.0",
                "const": "sin(x)"}}

    ref_out = refpde.ScalarField(ref_grid, data).laplace(bc, backend="jax")
    tpu_out = pde_tpu.ScalarField(tpu_grid, data).laplace(bc)
    np.testing.assert_allclose(
        tpu_out.to_numpy(), np.asarray(ref_out.data), **TOL
    )
