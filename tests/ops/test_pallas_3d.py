"""3D Pallas kernel correctness in interpreter mode (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.ops.pallas_cartesian import (
    _pick_band_k_3d,
    supports_affine_laplace_3d,
)


def test_supports_3d():
    # CPU backend → unsupported for compiled mode
    grid = pde.UnitGrid([32, 32, 128], periodic=True)
    assert not supports_affine_laplace_3d(grid, np.float32)
    # band/k selection by plane size
    assert _pick_band_k_3d((128, 128, 128), 4) == (8, 4)
    assert _pick_band_k_3d((256, 256, 256), 4) == (8, 2)  # k-plane halos freed VMEM
    assert _pick_band_k_3d((512, 512, 512), 4) is None
    # fallback path still runs (generic XLA lowering)
    state = pde.ScalarField.random_uniform(
        grid, rng=np.random.default_rng(0), dtype=jnp.float32
    )
    eq = pde.DiffusionPDE(0.1)
    solver = pde.solvers.EulerSolver(eq, adaptive=False)
    stepper = solver.make_stepper(state, dt=0.05)
    out, t = stepper(state, 0.0, 0.25)
    assert solver.info.get("fused_step") is None
    assert np.all(np.isfinite(np.asarray(out.data)))


@pytest.mark.parametrize(
    "bc",
    [
        {"derivative": 0},
        {"x": {"value": 1}, "y": {"derivative": 0.5}, "z": "periodic"},
        {"x": "periodic", "y": {"curvature": 0}, "z": {"value": 0.5}},
    ],
    ids=["noflux", "mixed-xy", "mixed-yz"],
)
def test_affine_laplace_3d_bc_interpret(bc, rng):
    """Const-affine BCs in the 3D fused kernel match the XLA path."""
    from pde_tpu.ops.pallas_cartesian import make_affine_laplace_3d

    periodic = [bc.get(ax) == "periodic" for ax in "xyz"]
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=periodic)
    bcs = grid.get_boundary_conditions(bc)
    data = jnp.asarray(rng.random((16, 8, 8)), dtype=jnp.float64)
    kernel, k = make_affine_laplace_3d(
        grid, a=1.0, b=1e-4, k=4, dtype=jnp.float64, bcs=bcs, interpret=True
    )
    out = kernel(data)
    lap = grid.make_operator("laplace", bc=bc)
    ref = data
    for _ in range(4):
        ref = ref + 1e-4 * lap(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12,
                               atol=1e-12)


def test_fused_euler_window_3d_bc_solver_path(rng, monkeypatch):
    """3D DiffusionPDE with no-flux BCs hits the fused path end-to-end."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.05, bc={"derivative": 0})

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=1e-4)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=1e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )
    assert float(res.integral) == pytest.approx(float(state.integral), rel=1e-9)


def test_fused_window_3d_randomized_configs(rng, monkeypatch):
    """Property sweep: random shapes x k x BC mixes x remainder steps stay
    consistent with the XLA lowering (the 3D analogue of the 2D
    test_fused_window_randomized_configs)."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    def random_side_bc(face_shape):
        kind = rng.choice([
            "value", "derivative", "mixed", "curvature",
            "value_array", "mixed_array_gamma", "value_t",
        ])
        if kind == "mixed":
            return {"type": "mixed", "value": float(rng.uniform(-1, 2)),
                    "const": float(rng.uniform(-1, 1))}
        if kind == "value_array":
            return {"value": rng.uniform(-1, 1, face_shape)}
        if kind == "mixed_array_gamma":
            return {"type": "mixed", "value": rng.uniform(0.2, 2, face_shape),
                    "const": float(rng.uniform(-1, 1))}
        if kind == "value_t":
            w = float(rng.uniform(0.5, 4))
            return {"value_expression": f"sin({w} * t)"}
        return {kind: float(rng.uniform(-1, 1))}

    for trial in range(8):
        # the banded x axis needs nx % 8 == 0 (the band table); y/z are free
        shape = (
            int(rng.choice([8, 16])),
            int(rng.choice([8, 12, 16])),
            int(rng.choice([8, 12, 16])),
        )
        periodic = [bool(rng.integers(2)) for _ in range(3)]
        bc = {}
        for a, (ax, per) in enumerate(zip("xyz", periodic)):
            if per:
                bc[ax] = "periodic"
            else:
                face = tuple(n for d, n in enumerate(shape) if d != a)
                bc[ax + "-"] = random_side_bc(face)
                bc[ax + "+"] = random_side_bc(face)
        grid = pde.CartesianGrid(
            [(0, float(rng.uniform(0.5, 2))) for _ in range(3)],
            shape, periodic=periodic,
        )
        state = pde.ScalarField.random_uniform(grid, rng=rng)
        eq = pde.DiffusionPDE(diffusivity=float(rng.uniform(0.01, 0.2)), bc=bc)
        steps = int(rng.integers(3, 11))  # exercises remainder decomposition

        monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
        solver = EulerSolver(eq)
        res = Controller(solver, t_range=steps * 1e-4, tracker=None).run(
            state, dt=1e-4
        )
        assert solver.info.get("fused_step") is True, f"trial {trial}: {bc}"
        assert solver.info["steps"] == steps
        monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
        ref = eq.solve(state, t_range=steps * 1e-4, dt=1e-4, tracker=None)
        np.testing.assert_allclose(
            np.asarray(res.data), np.asarray(ref.data), rtol=1e-11,
            atol=1e-12, err_msg=f"trial {trial}: shape={shape} bc={bc}",
        )


def test_affine_laplace_3d_direct_k_sweep(rng):
    """Direct kernel calls at every temporal-blocking factor match the
    repeated XLA operator application."""
    from pde_tpu.ops.pallas_cartesian import make_affine_laplace_3d

    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=True)
    data = jnp.asarray(rng.random((16, 8, 8)))
    lap = grid.make_operator("laplace", bc="periodic")
    for k in (1, 2, 4):
        kernel, k_used = make_affine_laplace_3d(
            grid, a=1.0, b=2e-4, k=k, dtype=jnp.float64, interpret=True
        )
        assert k_used == k
        ref = data
        for _ in range(k):
            ref = ref + 2e-4 * lap(ref)
        np.testing.assert_allclose(
            np.asarray(kernel(data)), np.asarray(ref), rtol=1e-12, atol=1e-12
        )


def test_affine_laplace_3d_anisotropic(rng):
    """Anisotropic discretizations use the per-axis scale branch."""
    from pde_tpu.ops.pallas_cartesian import make_affine_laplace_3d

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (16, 8, 8),
                             periodic=True)
    data = jnp.asarray(rng.random((16, 8, 8)))
    kernel, _ = make_affine_laplace_3d(
        grid, a=1.0, b=1e-4, k=2, dtype=jnp.float64, interpret=True
    )
    lap = grid.make_operator("laplace", bc="periodic")
    ref = data
    for _ in range(2):
        ref = ref + 1e-4 * lap(ref)
    np.testing.assert_allclose(
        np.asarray(kernel(data)), np.asarray(ref), rtol=1e-12, atol=1e-12
    )


def test_fused_window_3d_remainder_steps(rng, monkeypatch):
    """Step counts not divisible by k decompose over the binary ladder."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=True)
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.05)

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=7e-4, tracker=None).run(state, dt=1e-4)
    assert solver.info.get("fused_step") is True
    assert solver.info["steps"] == 7
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=7e-4, dt=1e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


def test_fused_window_3d_tracker_windows(rng, monkeypatch):
    """Tracker interrupts split the 3D run into multiple kernel windows."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.05, bc={"derivative": 0})

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver
    from pde_tpu.storage.memory import MemoryStorage

    storage = MemoryStorage()
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01,
                     tracker=storage.tracker(0.004)).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True
    assert len(storage) >= 3
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=1e-3, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


def test_3d_band_k_table_vmem_accounting():
    """The (band, k) table tracks the k-plane halo sizing (round-2 fix)."""
    from pde_tpu.ops.pallas_cartesian import _pick_band_k_3d

    # plane = ny*nz*itemsize: 96 KB boundary between k=4 and k=2
    assert _pick_band_k_3d((64, 64, 128), 4) == (8, 4)   # 32 KB plane
    assert _pick_band_k_3d((64, 128, 192), 4) == (8, 4)  # 96 KB plane
    assert _pick_band_k_3d((64, 128, 256), 4) == (8, 2)  # 128 KB plane
    assert _pick_band_k_3d((64, 256, 256), 4) == (8, 2)  # 256 KB plane
    assert _pick_band_k_3d((64, 512, 256), 4) is None    # too large
    # band must divide the x extent
    assert _pick_band_k_3d((12, 64, 128), 4) is None


def test_supports_ext_3d_preconditions():
    """Halo-supply and alignment preconditions of the 3D ext kernel."""
    from pde_tpu.ops.pallas_cartesian import supports_affine_laplace_ext_3d

    ok = supports_affine_laplace_ext_3d
    # interpret mode: only the halo-supply constraint applies
    assert ok((8, 8, 8), np.float64, 2, ext_axes=(True, True, False),
              interpret=True)
    assert not ok((1, 8, 8), np.float64, 2, ext_axes=(True, False, False),
                  interpret=True)  # shard thinner than the halo
    assert not ok((8, 1, 8), np.float64, 2, ext_axes=(True, True, False),
                  interpret=True)
    # x must always be extended (it is the banded DMA axis)
    assert not ok((8, 8, 8), np.float64, 2, ext_axes=(False, True, False),
                  interpret=True)
    # 2D shapes are rejected
    assert not ok((8, 8), np.float64, 1, ext_axes=(True, False),
                  interpret=True)


def test_ext_3d_direct_periodic_wrap(rng):
    """Direct ext-3D kernel call with a manually built periodic halo matches
    the wrapped single-device kernel."""
    from pde_tpu.ops.pallas_cartesian import (
        make_affine_laplace_3d,
        make_affine_laplace_ext_3d,
    )

    grid = pde.CartesianGrid([(0, 1)] * 3, (8, 8, 8), periodic=True)
    data = rng.random((8, 8, 8))
    k = 2
    ref_kernel, _ = make_affine_laplace_3d(
        grid, a=1.0, b=1e-4, k=k, dtype=jnp.float64, interpret=True
    )
    ext_kernel = make_affine_laplace_ext_3d(
        (8, 8, 8), a=1.0, b=1e-4, k=k, discretization=grid.discretization,
        ext_axes=(True, True, True), dtype=jnp.float64, interpret=True,
    )
    ext = np.pad(data, k, mode="wrap")
    np.testing.assert_allclose(
        np.asarray(ext_kernel(ext)), np.asarray(ref_kernel(data)),
        rtol=1e-12, atol=1e-12,
    )


def test_ext_3d_bc_edge_flags(rng):
    """Edge-flag-gated BC fixups in the ext-3D kernel match the XLA chain."""
    from pde_tpu.ops.pallas_cartesian import (
        affine_bc_params,
        make_affine_laplace_ext_3d,
    )

    grid = pde.CartesianGrid([(0, 1)] * 3, (8, 8, 8))
    bcs = grid.get_boundary_conditions({"derivative": 0})
    bc_params = affine_bc_params(grid, bcs)
    data = rng.random((8, 8, 8))
    k = 2
    ext_kernel = make_affine_laplace_ext_3d(
        (8, 8, 8), a=1.0, b=1e-4, k=k, discretization=grid.discretization,
        ext_axes=(True, True, True), dtype=jnp.float64, bc_params=bc_params,
        interpret=True,
    )
    ext = np.pad(data, k)  # zeros: must be ignored at flagged edges
    flags = np.ones(6, dtype=np.int32)
    lap = grid.make_operator("laplace", bc={"derivative": 0})
    ref = jnp.asarray(data)
    for _ in range(k):
        ref = ref + 1e-4 * lap(ref)
    np.testing.assert_allclose(
        np.asarray(ext_kernel(ext, flags)), np.asarray(ref),
        rtol=1e-12, atol=1e-12,
    )


def test_3d_gating_on_mocked_tpu(monkeypatch):
    """Benchmark-scale 3D configs pass the compiled-mode support checks."""
    import pde_tpu.ops.pallas_cartesian as pc

    monkeypatch.setattr(pc.jax, "default_backend", lambda: "tpu")
    assert pc.supports_affine_laplace_3d(
        pde.UnitGrid([128, 128, 128], periodic=True), np.float32
    )
    assert pc.supports_affine_laplace_3d(
        pde.UnitGrid([256, 256, 256], periodic=True), np.float32
    )
    # misaligned lanes -> no fused path in compiled mode
    assert not pc.supports_affine_laplace_3d(
        pde.UnitGrid([128, 128, 100], periodic=True), np.float32
    )
    # f64 never fuses in compiled mode
    assert not pc.supports_affine_laplace_3d(
        pde.UnitGrid([128, 128, 128], periodic=True), np.float64
    )
    # bf16 is rejected in 3D: the y/z neighbors need rolls, which Mosaic
    # cannot compile for non-32-bit data (round-3 gating fix)
    assert not pc.supports_affine_laplace_3d(
        pde.UnitGrid([128, 128, 128], periodic=True), jnp.bfloat16
    )
    # ext variant on an aligned local shard
    assert pc.supports_affine_laplace_ext_3d(
        (64, 64, 128), np.float32, 2, ext_axes=(True, True, False)
    )
    assert not pc.supports_affine_laplace_ext_3d(
        (64, 100, 128), np.float32, 2, ext_axes=(True, False, False)
    )  # misaligned non-extended y


def test_3d_f32_dtype_stability(rng, monkeypatch):
    """f32 3D states keep their dtype through the fused window under x64."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=True)
    state = pde.ScalarField(
        grid, np.asarray(rng.random((16, 8, 8)), dtype=np.float32)
    )
    eq = pde.DiffusionPDE(0.05)

    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    stepper = solver.make_stepper(state, dt=1e-3)
    out, _ = stepper(state, 0.0, 0.01)
    assert solver.info.get("fused_step") is True
    assert np.asarray(out.data).dtype == np.float32


@pytest.mark.parametrize(
    "rhs, bc",
    [
        ("0.1 * laplace(c) - c**3", "periodic"),
        ("laplace(0.5 * c**3 - c - 0.1 * laplace(c))", "periodic"),
        ("0.1 * laplace(c) + c - c**3", {"derivative": 0}),
        ("0.2 * laplace(c) - 0.1 * gradient_squared(c)", "periodic"),
        ("0.1 * laplace(c) + 0.05 * dot(gradient(c), gradient(c))",
         {"derivative": 0}),
        ("0.1 * divergence(gradient(c)) - c", "periodic"),
    ],
    ids=["allen-cahn", "cahn-hilliard", "ac-noflux", "kpz", "dot-grad",
         "div-grad"],
)
def test_3d_expression_pde_fused_parity(rhs, bc, rng, monkeypatch):
    """3D expression rhs trees fuse through the 3D multi window and match
    the XLA lowering (the round-3 extension of the stencil compiler)."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    periodic = bc == "periodic"
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=periodic)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng,
                                           label="c")
    eq = pde.PDE({"c": rhs}, bc=bc)

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=1e-3, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


def test_3d_coupled_expression_fused_parity(rng, monkeypatch):
    """Coupled 3D systems share the volume pass (Brusselator)."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=True)
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.ScalarField.random_uniform(grid, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({
        "u": "0.1 * laplace(u) + 1 - 2 * u + u**2 * v",
        "v": "0.05 * laplace(v) + u - u**2 * v",
    })

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=1e-3, tracker=None)
    for a, b in zip(res, ref):
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.data), rtol=1e-12, atol=1e-13
        )


def test_3d_predefined_models_fused(rng, monkeypatch):
    """Predefined scalar models reach the 3D kernel via the expression
    route; 3D SDEs fall back cleanly."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8), periodic=True)
    state = pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng)

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    eq = pde.AllenCahnPDE(interface_width=0.5)
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.005, tracker=None).run(state, dt=1e-4)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.005, dt=1e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )
    # stochastic 3D: clean fallback
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED")
    eq_sde = pde.KPZInterfacePDE(noise=0.1, rng=np.random.default_rng(0))
    solver2 = EulerSolver(eq_sde)
    stepper = solver2.make_stepper(state, dt=1e-4)
    out, _ = stepper(state, 0.0, 1e-3)
    assert not solver2.info.get("fused_step", False)
    assert np.all(np.isfinite(np.asarray(out.data)))


def test_3d_integral_conservation_noflux(rng, monkeypatch):
    """No-flux diffusion conserves the integral through the fused kernel."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 8, 8))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1, bc={"derivative": 0})

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.02, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True
    assert float(res.integral) == pytest.approx(float(state.integral),
                                                rel=1e-9)


# -- inhomogeneous / time-dependent BC values in the 3D fused windows -----------------


def _vals_for_side(rng, grid, ax):
    shape = tuple(n for a, n in enumerate(grid.shape) if a != ax)
    return rng.uniform(-1.0, 1.0, shape)


@pytest.mark.parametrize("ax", [0, 1, 2], ids=["x-side", "y-side", "z-side"])
def test_3d_inhomogeneous_bc_parity(ax, rng, monkeypatch):
    """Per-boundary-FACE value arrays lower into the 3D fused window:
    x-side planes as a (1, ny, nz) VMEM block, y-side as (R, 1, nz) DMA
    slices, z-side as (R, ny, 128) lane-broadcast slices (reference
    virtual-point arrays, `local.py:1541-2104`, in 3D)."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    axes = "xyz"
    bc = {axes[a]: {"derivative": 0} for a in range(3) if a != ax}
    bc[f"{axes[ax]}-"] = {"value": _vals_for_side(rng, grid, ax)}
    bc[f"{axes[ax]}+"] = {"derivative": 0}
    eq = pde.DiffusionPDE(0.1, bc=bc)

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.02, tracker=None).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.02, dt=2e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


@pytest.mark.parametrize(
    "bc",
    [
        {"x": {"derivative": 0}, "y-": {"value_expression": "sin(3 * t)"},
         "y+": {"value": 0}, "z": {"derivative": 0}},
        {"x-": {"value_expression": "t"}, "x+": {"derivative": 0},
         "y": {"derivative": 0}, "z": {"value": 0}},
        {"x-": {"value_expression": "sin(y + z)"}, "x+": {"derivative": 0.5},
         "y-": {"derivative_expression": "cos(2 * t)"}, "y+": {"value": 0},
         "z": {"derivative": 0}},
    ],
    ids=["t-col", "t-row", "mixed-array-and-t"],
)
def test_3d_time_dependent_bc_parity(bc, rng, monkeypatch):
    """t-dependent expression BC values pass per-step SMEM consts in 3D."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1, bc=bc)

    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.02, tracker=None).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.02, dt=2e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


def test_3d_time_bc_tracker_windows(rng, monkeypatch):
    """The 3D per-chunk t table restarts from each window's t_start."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver
    from pde_tpu.storage.memory import MemoryStorage

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    bc = {"x": {"derivative": 0}, "y-": {"value_expression": "sin(5 * t)"},
          "y+": {"value": 0}, "z": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.2, bc=bc)
    storage = MemoryStorage()
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.03,
                     tracker=storage.tracker(0.01)).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.03, dt=2e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


def test_3d_coupled_routed_bc_side_inputs(rng, monkeypatch):
    """Per-(var, op) bc_ops routing with array + t-dependent values through
    the coupled 3D volume kernel."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    u = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    v = pde.ScalarField.random_uniform(grid, rng=rng, label="v")
    state = pde.FieldCollection([u, v])
    vals = rng.uniform(0.0, 1.0, (8, 16))
    eq = pde.PDE(
        {
            "u": "1 + u**2*v - 2.2*u + 0.1*laplace(u)",
            "v": "1.2*u - u**2*v + 0.05*laplace(v)",
        },
        bc_ops={
            "u:laplace": {"x": {"derivative": 0}, "y-": {"value": vals},
                          "y+": {"derivative": 0}, "z": {"value": 0}},
            "v:laplace": {"x": {"derivative": 0}, "y": {"derivative": 0},
                          "z-": {"value_expression": "cos(t)"},
                          "z+": {"value": 0}},
        },
    )
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.02, tracker=None).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.02, dt=2e-4, tracker=None)
    for a, b in zip(res, ref, strict=True):
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.data), rtol=1e-12, atol=1e-13
        )


def test_3d_bc_side_input_gates(rng, monkeypatch):
    """3D gating contract: every staged BC value class fuses, serial AND
    decomposed (xt included — per-chunk step-indexed face tables); the
    only remaining fallbacks are the inherently non-affine forms."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    bc_xt = {"x": {"derivative": 0},
             "y-": {"value_expression": "sin(z - t)"},
             "y+": {"value": 0}, "z": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.1, bc=bc_xt)
    solver = EulerSolver(eq)
    stepper = solver.make_stepper(state, dt=2e-4)
    out, _ = stepper(state, 0.0, 2e-3)
    assert solver.info.get("fused_step") is True
    assert np.all(np.isfinite(np.asarray(out.data)))
    # sharded 3D xt fuses too (per-shard slices of global per-chunk tables)
    solver_x = EulerSolver(eq, decomposition=[2, 1, 1])
    stepper_x = solver_x.make_stepper(state, dt=2e-4)
    out_x, _ = stepper_x(state, 0.0, 2e-3)
    assert solver_x.info.get("fused_step") is True
    assert np.all(np.isfinite(np.asarray(out_x.data)))
    # nonlinear-in-value expression BCs stay on the XLA path
    eq3 = pde.DiffusionPDE(0.1, bc={
        "x": {"derivative": 0}, "y": {"virtual_point": "value**2"},
        "z": {"value": 0}})
    solver3 = EulerSolver(eq3)
    out3, _ = solver3.make_stepper(state, dt=2e-4)(state, 0.0, 2e-3)
    assert solver3.info.get("fused_step") is None
    assert np.all(np.isfinite(np.asarray(out3.data)))


@pytest.mark.parametrize(
    "bc",
    [
        {"x-": {"value_expression": "sin(y + z - t)"}, "x+": {"derivative": 0},
         "y": {"derivative": 0}, "z": {"value": 0}},
        {"x": {"derivative": 0}, "y-": {"value_expression": "sin(z - 2 * t)"},
         "y+": {"value": 0}, "z": {"derivative": 0}},
        {"x": {"derivative": 0}, "y": {"value": 0},
         "z-": {"value_expression": "cos(x + t)"}, "z+": {"derivative": 0}},
        {"x-": {"value_expression": "sin(y + z - t)"}, "x+": {"derivative": 0},
         "y-": {"value": np.linspace(-1, 1, 8 * 16).reshape(8, 16)},
         "y+": {"value_expression": "sin(3 * t)"}, "z": {"derivative": 0}},
    ],
    ids=["xt-x", "xt-y", "xt-z", "xt-plus-array-plus-t"],
)
def test_3d_space_time_bc_parity(bc, rng, monkeypatch):
    """Space-AND-time BC values lower into the 3D window as per-chunk
    step-indexed face tables (one extra leading k dim per staging
    layout)."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.DiffusionPDE(0.1, bc=bc)
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=2e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )


@pytest.mark.parametrize(
    "decomposition", [[2, 1, 1], [1, 2, 1], [1, 1, 2], [2, 2, 2]]
)
@pytest.mark.parametrize(
    "side", ["x-plane", "y-side", "z-side", "t-arr", "xt"]
)
def test_3d_sharded_bc_side_input_parity(side, decomposition, rng,
                                         monkeypatch):
    """Per-face value arrays and t-dependent consts reach the SHARDED 3D
    ext kernel: host-precomputed GLOBAL face arrays (wrap-padded along x
    and decomposed axes) sliced per shard by lax.axis_index — bit-identical
    to the single-device fused kernel."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    vp = rng.uniform(-1.0, 1.0, (8, 16))
    vy = rng.uniform(-1.0, 1.0, (8, 16))
    vz = rng.uniform(-1.0, 1.0, (8, 8))
    bc = {
        "x-plane": {"x-": {"value": vp}, "x+": {"derivative": 0},
                    "y": {"derivative": 0}, "z": {"value": 0}},
        "y-side": {"x": {"derivative": 0}, "y-": {"value": vy},
                   "y+": {"derivative": 0}, "z": {"value": 0}},
        "z-side": {"x": {"derivative": 0}, "y": {"value": 0},
                   "z-": {"value": vz}, "z+": {"derivative": 0}},
        "t-arr": {"x-": {"value": vp}, "x+": {"derivative": 0},
                  "y-": {"value_expression": "sin(3 * t)"}, "y+": {"value": 0},
                  "z": {"derivative": 0}},
        "xt": {"x": {"derivative": 0},
               "y-": {"value_expression": "sin(z - 2 * t)"},
               "y+": {"value": 0},
               "z-": {"value_expression": "cos(x + t)"},
               "z+": {"derivative": 0}},
    }[side]
    eq = pde.DiffusionPDE(0.1, bc=bc)
    solver1 = EulerSolver(eq)
    res1 = Controller(solver1, t_range=0.01, tracker=None).run(state, dt=2e-4)
    assert solver1.info.get("fused_step") is True
    solver = EulerSolver(eq, decomposition=decomposition)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True
    np.testing.assert_array_equal(np.asarray(res.data), np.asarray(res1.data))


@pytest.mark.parametrize("ax", [0, 1, 2], ids=["x-side", "y-side", "z-side"])
def test_3d_array_factor_parity(ax, rng, monkeypatch):
    """Robin BCs with per-face gamma ARRAYS lower into the 3D windows
    (staged like per-face consts, bound into helpers.bc_factors) —
    single-device parity vs XLA AND decomposed bit-identity vs the serial
    fused kernel."""
    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.CartesianGrid([(0, 1), (0, 2), (0, 3)], (8, 8, 16))
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    gam = rng.uniform(0.5, 2.0, _vals_for_side(rng, grid, ax).shape)
    axes = "xyz"
    bc = {axes[a]: {"derivative": 0} for a in range(3) if a != ax}
    bc[f"{axes[ax]}-"] = {"type": "mixed", "value": gam, "const": 0.3}
    bc[f"{axes[ax]}+"] = {"value": 0}
    eq = pde.DiffusionPDE(0.1, bc=bc)

    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.01, tracker=None).run(state, dt=2e-4)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.01, dt=2e-4, tracker=None)
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED")
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-12, atol=1e-13
    )

    solver2 = EulerSolver(eq, decomposition=[2, 2, 1])
    res2 = Controller(solver2, t_range=0.01, tracker=None).run(state, dt=2e-4)
    assert solver2.info.get("fused_step") is True
    np.testing.assert_array_equal(np.asarray(res2.data), np.asarray(res.data))


# ---------------------------------------------------------------------------
# y-chunked 3D kernels (large planes: 2D pallas grid, halo-extended y)
# ---------------------------------------------------------------------------


def _euler_lap_step(specs, b):
    def make_step(h):
        def step(works):
            (w,) = works
            return [h.trim(w, 1) + b * h.lap(w, bc=specs)]

        return step

    return make_step


@pytest.mark.parametrize(
    "periodic, bc",
    [
        (True, None),
        (False, {"value": 1.5}),
        (False, {"derivative": 0.25}),
        (
            [True, False, False],
            {"x": "periodic", "y": {"value": 2.0}, "z": {"derivative": -0.5}},
        ),
    ],
    ids=["periodic", "dirichlet", "neumann", "mixed"],
)
def test_ychunk_window_3d_parity(periodic, bc, rng):
    """The y-chunked kernel matches the roll-path kernel AND the XLA oracle
    for every scalar-affine BC class (the y-edge ghost fixups run on the
    edge chunks only, gated by ``helpers.flags``)."""
    from pde_tpu.ops.pallas_cartesian import (
        affine_bc_specs,
        make_fused_multi_stencil_window_3d,
    )

    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 16, 16), periodic=periodic)
    specs = None
    if bc is not None:
        specs = affine_bc_specs(grid, grid.get_boundary_conditions(bc))
    make_step = _euler_lap_step(specs, 1e-3)
    data = jnp.asarray(rng.random((16, 16, 16)), dtype=jnp.float64)

    wy, k = make_fused_multi_stencil_window_3d(
        grid, make_step, 1, 1, dtype=np.float64, interpret=True, ychunk=True
    )
    wr, _ = make_fused_multi_stencil_window_3d(
        grid, make_step, 1, 1, dtype=np.float64, interpret=True,
        ychunk=False, k=k,
    )
    out_y = np.asarray(wy([data])[0])
    out_r = np.asarray(wr([data])[0])
    np.testing.assert_allclose(out_y, out_r, rtol=1e-13, atol=1e-13)

    lap = grid.make_operator(
        "laplace", bc="periodic" if bc is None else bc
    )
    ref = data
    for _ in range(k):
        ref = ref + 1e-3 * lap(ref)
    np.testing.assert_allclose(
        out_y, np.asarray(ref), rtol=1e-12, atol=1e-12
    )


def test_ychunk_window_3d_multifield_and_hps2(rng):
    """Coupled two-field systems and two-halo steps (Cahn-Hilliard-like
    lap∘lap) run through the y-chunked kernel bit-identically to the
    roll-path kernel."""
    from pde_tpu.ops.pallas_cartesian import (
        affine_bc_specs,
        make_fused_multi_stencil_window_3d,
    )

    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 16, 16), periodic=True)

    def make_step2(h):
        def step(works):
            u, v = works
            cu, cv = h.trim(u, 1), h.trim(v, 1)
            return [
                cu + 1e-3 * h.lap(u) + 1e-4 * cv,
                cv + 2e-3 * h.lap(v) - 1e-4 * cu,
            ]

        return step

    datas = [
        jnp.asarray(rng.random((16, 16, 16)), dtype=jnp.float64)
        for _ in range(2)
    ]
    wy, k = make_fused_multi_stencil_window_3d(
        grid, make_step2, 1, 2, dtype=np.float64, interpret=True, ychunk=True
    )
    wr, _ = make_fused_multi_stencil_window_3d(
        grid, make_step2, 1, 2, dtype=np.float64, interpret=True,
        ychunk=False, k=k,
    )
    for a, b in zip(wy(list(datas)), wr(list(datas))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    grid2 = pde.CartesianGrid([(0, 1)] * 3, (16, 16, 16))
    specs = affine_bc_specs(
        grid2, grid2.get_boundary_conditions({"derivative": 0.0})
    )

    def make_step_ch(h):
        def step(works):
            (w,) = works
            inner = h.lap(w, bc=specs)
            return [h.trim(w, 2) - 1e-6 * h.lap(inner, bc=specs)]

        return step

    data = jnp.asarray(rng.random((16, 16, 16)), dtype=jnp.float64)
    wy, k = make_fused_multi_stencil_window_3d(
        grid2, make_step_ch, 2, 1, dtype=np.float64, interpret=True,
        ychunk=True,
    )
    wr, _ = make_fused_multi_stencil_window_3d(
        grid2, make_step_ch, 2, 1, dtype=np.float64, interpret=True,
        ychunk=False, k=k,
    )
    np.testing.assert_array_equal(
        np.asarray(wy([data])[0]), np.asarray(wr([data])[0])
    )


def test_ychunk_window_3d_t_dependent_bc(rng, monkeypatch):
    """Time-dependent BC consts lower into the y-chunked kernel via the
    per-step SMEM table (solver path, forced through ychunk)."""
    import functools

    from pde_tpu.ops import pallas_cartesian as pc
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(
        pc, "make_chunked_multi_window_3d",
        functools.partial(pc.make_chunked_multi_window_3d, ychunk=True),
    )
    grid = pde.CartesianGrid(
        [(0, 1)] * 3, (16, 16, 16), periodic=[False, False, True]
    )
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE(
        {"c": "0.01 * laplace(c)"},
        bc={
            "x-": {"value_expression": "sin(3 * t)"},
            "x+": {"value": 1.0},
            "y": {"derivative": 0.0},
            "z": "periodic",
        },
    )
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.1, tracker=None).run(state, dt=0.01)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.1, dt=0.01, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-10, atol=1e-12
    )


def test_ychunk_gating():
    """Multi-stage per-(step, stage) BC tables refuse the y-chunked mode
    (the chunked kernel carries no ``bind_stage`` rebinding); the hardware
    picker prefers the measured-best config at 256³ and declines unaligned
    shapes; interpret-mode auto stays on the roll path."""
    from pde_tpu.ops.pallas_cartesian import (
        PallasUnsupportedError,
        _pick_ychunk_3d,
        collect_bc_side_inputs_3d,
        make_fused_multi_stencil_window_3d,
    )

    assert _pick_ychunk_3d((256, 256, 256), 4, 1, 1) == (64, 128, 8)
    assert _pick_ychunk_3d((64, 256, 128), 4, 1, 1) == (64, 128, 8)
    # bigger volumes than the roll path supports still get a config
    assert _pick_ychunk_3d((512, 512, 512), 4, 1, 1) is not None
    assert _pick_ychunk_3d((250, 256, 256), 4, 1, 1) is None  # unaligned x

    grid = pde.CartesianGrid([(0, 1)] * 3, (16, 16, 16))
    from pde_tpu.ops.pallas_cartesian import affine_bc_specs

    bcs = grid.get_boundary_conditions(
        {"x-": {"value_expression": "cos(y) * sin(3 * t)"},
         "x+": {"value": 0}, "y": {"derivative": 0}, "z": {"derivative": 0}}
    )
    specs = affine_bc_specs(grid, bcs)
    bc_inputs = collect_bc_side_inputs_3d({"c": specs})
    assert bc_inputs["xt"]
    # single-stage xt tables lower (round-5); multi-stage (fused RK4)
    # per-(step, stage) tables stay on the roll path
    win, _ = make_fused_multi_stencil_window_3d(
        grid, _euler_lap_step(specs, 1e-3), 1, 1, dtype=np.float64,
        interpret=True, ychunk=True, bc_inputs=bc_inputs,
    )
    assert win.xt_entries
    with pytest.raises(PallasUnsupportedError, match="multi-stage"):
        make_fused_multi_stencil_window_3d(
            grid, _euler_lap_step(specs, 1e-3), 1, 1, dtype=np.float64,
            interpret=True, ychunk=True, bc_inputs=bc_inputs,
            stages_per_step=4,
        )


@pytest.mark.parametrize(
    "bc",
    [
        # x-side array plane (varies over the y-chunked dim: per-chunk
        # y-sliced staging) + scalar sides
        {"x-": {"value": "ARRAY_X"}, "x+": {"value": 0},
         "y": {"derivative": 0}, "z": {"derivative": 0}},
        # y-side array (varies over x: per-band x-sliced staging)
        {"x": {"derivative": 0}, "y-": {"value": "ARRAY_Y"},
         "y+": {"derivative": 0}, "z": {"derivative": 0}},
        # z-side array (varies over x AND y: sliced in both dims) plus a
        # mixed BC with per-point ARRAY GAMMA (factor staging)
        {"x": {"derivative": 0},
         "y-": {"type": "mixed", "value": "GAMMA_Y", "const": 0.2},
         "y+": {"derivative": 0}, "z-": {"value": "ARRAY_Z"},
         "z+": {"derivative": 0}},
    ],
    ids=["x-plane", "y-block", "z-block-and-gamma"],
)
def test_ychunk_window_3d_array_bc_parity(bc, rng):
    """Per-face ARRAY BC values and Robin factors lower into the y-chunked
    kernel (round-5: wrap-padded blocks DMA-sliced per program) and match
    the roll-path kernel bit-for-bit and the XLA oracle."""
    from pde_tpu.ops.pallas_cartesian import (
        affine_bc_specs,
        collect_bc_side_inputs_3d,
        make_fused_multi_stencil_window_3d,
    )

    n = 16
    arrays = {
        "ARRAY_X": rng.uniform(-1, 1, (n, n)),
        "ARRAY_Y": rng.uniform(-1, 1, (n, n)),
        "ARRAY_Z": rng.uniform(-1, 1, (n, n)),
        "GAMMA_Y": rng.uniform(0.5, 2.0, (n, n)),
    }

    def resolve(v):
        return arrays[v] if isinstance(v, str) and v in arrays else v

    bc = {
        side: {kk: resolve(vv) for kk, vv in spec.items()}
        if isinstance(spec, dict) else spec
        for side, spec in bc.items()
    }
    grid = pde.CartesianGrid([(0, 1)] * 3, (n, n, n))
    specs = affine_bc_specs(grid, grid.get_boundary_conditions(bc))
    bc_inputs = collect_bc_side_inputs_3d({"c": specs})
    assert bc_inputs["arrays"]
    make_step = _euler_lap_step(specs, 1e-3)
    data = jnp.asarray(rng.random((n, n, n)), dtype=jnp.float64)

    wy, k = make_fused_multi_stencil_window_3d(
        grid, make_step, 1, 1, dtype=np.float64, interpret=True,
        ychunk=True, bc_inputs=bc_inputs,
    )
    wr, _ = make_fused_multi_stencil_window_3d(
        grid, make_step, 1, 1, dtype=np.float64, interpret=True,
        ychunk=False, k=k, bc_inputs=bc_inputs,
    )
    out_y = np.asarray(wy([data])[0])
    np.testing.assert_allclose(
        out_y, np.asarray(wr([data])[0]), rtol=1e-13, atol=1e-13
    )

    lap = grid.make_operator("laplace", bc=bc)
    ref = data
    for _ in range(k):
        ref = ref + 1e-3 * lap(ref)
    np.testing.assert_allclose(
        out_y, np.asarray(ref), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize(
    "bc",
    [
        # x-side xt plane (varies over the CHUNKED y axis + t: the table is
        # y-wrap-padded and y-sliced per chunk)
        {"x-": {"value_expression": "cos(y) * sin(3 * t)"},
         "x+": {"value": 0}, "y": {"derivative": 0}, "z": {"derivative": 0}},
        # y-side xt block (varies over x + t: x-sliced per band)
        {"x": {"derivative": 0}, "y-": {"value_expression": "sin(z - 2*t)"},
         "y+": {"derivative": 0}, "z": {"derivative": 0}},
        # z-side xt block (varies over x AND y + t: sliced in both dims),
        # mixed with a static array plane and a t-only value
        {"x-": {"value": "ARRAY_X"}, "x+": {"value_expression": "sin(3*t)"},
         "y": {"derivative": 0},
         "z-": {"value_expression": "cos(x + y - t)"},
         "z+": {"derivative": 0}},
    ],
    ids=["xt-x-plane", "xt-y-block", "xt-z-block-mixed"],
)
def test_ychunk_window_3d_xt_bc_parity(bc, rng):
    """Space-AND-time BC values lower into the y-chunked kernel (round-5:
    step-indexed tables wrap-padded and DMA-sliced per program like the
    static arrays, one extra leading k dim) and match the roll-path kernel
    (to fp64 rounding — the ext_y shifted-slice formulation reorders the
    ghost arithmetic) and the XLA oracle."""
    import jax

    from pde_tpu.ops.pallas_cartesian import (
        affine_bc_specs,
        collect_bc_side_inputs_3d,
        make_fused_multi_stencil_window_3d,
    )

    n = 16
    arrays = {"ARRAY_X": rng.uniform(-1, 1, (n, n))}
    bc = {
        side: {kk: arrays.get(vv, vv) if isinstance(vv, str) else vv
               for kk, vv in spec.items()}
        if isinstance(spec, dict) else spec
        for side, spec in bc.items()
    }
    grid = pde.CartesianGrid([(0, 1)] * 3, (n, n, n))
    bcs = grid.get_boundary_conditions(bc)
    specs = affine_bc_specs(grid, bcs)
    bc_inputs = collect_bc_side_inputs_3d({"c": specs})
    assert bc_inputs["xt"]
    make_step = _euler_lap_step(specs, 1e-3)
    data = jnp.asarray(rng.random((n, n, n)), dtype=jnp.float64)
    dt = 1e-3

    wy, k = make_fused_multi_stencil_window_3d(
        grid, make_step, 1, 1, dtype=np.float64, interpret=True,
        ychunk=True, bc_inputs=bc_inputs,
    )
    wr, _ = make_fused_multi_stencil_window_3d(
        grid, make_step, 1, 1, dtype=np.float64, interpret=True,
        ychunk=False, k=k, bc_inputs=bc_inputs,
    )
    assert wy.xt_entries == wr.xt_entries

    # per-window tables: step s reads the BC values at t0 + s*dt (the same
    # (step)-major rows make_chunked_multi_window_3d builds)
    ts = jnp.arange(k, dtype=jnp.float64) * dt
    xt_ops = []
    for ax, spec in wy.xt_entries:
        face = tuple(m for d, m in enumerate(grid.shape) if d != ax)
        xt_ops.append(jax.vmap(spec.const_xt)(ts).reshape(k, *face))
    t_specs = wy.t_specs or ()
    t_tab = None
    if t_specs:
        from pde_tpu.ops.pallas_cartesian import _t_slot_funcs

        t_tab = jnp.stack(
            [jax.vmap(fn)(ts) for fn in _t_slot_funcs(list(t_specs))], axis=1
        )

    out_y = np.asarray(wy([data], xt_ops, t_tab)[0])
    np.testing.assert_allclose(
        out_y, np.asarray(wr([data], xt_ops, t_tab)[0]),
        rtol=1e-13, atol=1e-13,
    )

    lap = grid.make_operator("laplace", bc=bcs)
    ref = data
    for s in range(k):
        ref = ref + 1e-3 * lap(ref, float(s * dt))
    np.testing.assert_allclose(
        out_y, np.asarray(ref), rtol=1e-12, atol=1e-12
    )


def test_ychunk_solver_3d_xt_bc(rng, monkeypatch):
    """Space-time BC values take the y-chunked kernel through the solver
    path (forced ychunk) and match the XLA run."""
    import functools

    from pde_tpu.ops import pallas_cartesian as pc
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.setenv("PDE_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(
        pc, "make_chunked_multi_window_3d",
        functools.partial(pc.make_chunked_multi_window_3d, ychunk=True),
    )
    grid = pde.CartesianGrid(
        [(0, 1)] * 3, (16, 16, 16), periodic=[False, False, True]
    )
    state = pde.ScalarField.random_uniform(grid, rng=rng)
    eq = pde.PDE(
        {"c": "0.01 * laplace(c)"},
        bc={
            "x-": {"value_expression": "cos(y) * sin(3 * t)"},
            "x+": {"value": 1.0},
            "y": {"derivative": 0.0},
            "z": "periodic",
        },
    )
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.1, tracker=None).run(state, dt=0.01)
    assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.1, dt=0.01, tracker=None)
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), rtol=1e-10, atol=1e-12
    )
