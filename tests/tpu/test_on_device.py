"""Real-TPU hardware lane: kernel-vs-XLA parity on actual Mosaic lowerings.

Run as ONE process: ``PDE_TPU_TEST_PLATFORM=tpu python -m pytest -m tpu -q``
(wrap in ``timeout`` — remote compiles are occasionally wedged; see
CLAUDE.md). Interpret mode has missed real geometry bugs before (round-2
fixups); every fused-path feature must also compile and match XLA on the
chip. CPU CI skips these via the conftest marker hook.
"""

import jax
import numpy as np
import pytest

import pde_tpu as pde

pytestmark = pytest.mark.tpu

F32_TOL = dict(rtol=2e-5, atol=2e-5)  # f32 after ~1000 accumulation steps


def _solve_pair(eq, state, t_range, dt, monkeypatch, decomposition=None):
    """(fused result, XLA result, solver info) for the same configuration."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    solver = EulerSolver(eq, decomposition=decomposition)
    res = Controller(solver, t_range=t_range, tracker=None).run(state, dt=dt)
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(
        state, t_range=t_range, dt=dt, tracker=None,
        solver="euler" if decomposition is None else "explicit_sharded",
        **({} if decomposition is None else
           {"adaptive": False, "decomposition": decomposition}),
    )
    # NaN==NaN passes assert_allclose: an unstable config (D*dt*sum(1/dx^2)
    # > 0.5) would make every parity test vacuous. Guard here so a diverged
    # run fails loudly (hardware finding: 8 configs were silently NaN).
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all(), (
            "diverged run — the parity comparison would be vacuous"
        )
    return res, ref, solver.info


def _f32(state):
    return pde.ScalarField(
        state.grid, np.asarray(state.data, dtype=np.float32)
    )


def test_fused_periodic_parity(rng, monkeypatch):
    """The temporal-blocking kernel matches XLA over 1000 f32 steps."""
    grid = pde.UnitGrid([256, 256], periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.1)
    res, ref, info = _solve_pair(eq, state, 1.0, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_gating_contract(rng, monkeypatch):
    """Unsupported shapes fall back; supported shapes fuse (the contract
    bench.py relies on)."""
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    # 100x100 breaks the lane alignment -> XLA fallback
    bad = _f32(pde.ScalarField.random_uniform(
        pde.UnitGrid([100, 100], periodic=True), rng=rng
    ))
    eq = pde.DiffusionPDE(0.1)
    solver = EulerSolver(eq)
    stepper = solver.make_stepper(bad, dt=1e-3)
    out, _ = stepper(bad, 0.0, 0.01)
    assert solver.info.get("fused_step") is None
    assert np.all(np.isfinite(np.asarray(out.data)))
    # aligned shape fuses
    good = _f32(pde.ScalarField.random_uniform(
        pde.UnitGrid([128, 128], periodic=True), rng=rng
    ))
    solver2 = EulerSolver(eq)
    stepper2 = solver2.make_stepper(good, dt=1e-3)
    out2, _ = stepper2(good, 0.0, 0.01)
    assert solver2.info.get("fused_step") is True
    assert np.all(np.isfinite(np.asarray(out2.data)))


def test_fused_noflux_bc_parity(rng, monkeypatch):
    """Const-affine BC fixups (no-flux) on the chip."""
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, bc={"derivative": 0})  # stability 0.33
    res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_inhomogeneous_bc_parity(rng, monkeypatch):
    """Array-valued BC consts: the (band+2h, 1) column-vector DMA and the
    (1, n_cols) row block must Mosaic-compile and match XLA."""
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (128, 128))
    values_y = np.linspace(0.0, 2.0, 128)  # y- boundary varying along x
    values_x = np.linspace(-1.0, 1.0, 128)  # x- boundary varying along y
    bc = {"x-": {"value": values_x}, "x+": {"derivative": 0},
          "y-": {"value": values_y}, "y+": {"derivative": 0}}
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.20
    res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_time_dependent_bc_parity(rng, monkeypatch):
    """t-dependent expression BCs via the per-step SMEM const table."""
    grid = pde.UnitGrid([128, 128], periodic=[True, False])
    bc = {"x": "periodic", "y-": {"value_expression": "sin(3 * t)"},
          "y+": {"derivative": 0}}
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.2, bc=bc)
    res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_corner_weight_parity(rng, monkeypatch):
    """The 9-point corner-weight Laplacian (fully periodic fused lowering,
    round-3 feature) must match the XLA path on silicon — the diagonal
    neighbors come from row-slices of the SAME two lane rolls, a layout
    only the chip validates."""
    grid = pde.UnitGrid([256, 256], periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    with pde.config({"operators.cartesian.laplacian_2d_corner_weight": 1 / 3}):
        eq = pde.DiffusionPDE(0.1)
        res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_3d_parity(rng, monkeypatch):
    """3D kernel (k-plane halos) on the chip."""
    grid = pde.CartesianGrid([(0, 1)] * 3, (64, 64, 128), periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01)  # stability 0.25
    res, ref, info = _solve_pair(eq, state, 0.2, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_sharded_ext_kernel_single_chip(rng, monkeypatch):
    """The halo-extended kernel + ppermute pad on a [1, 1] mesh (the only
    mesh a single chip can run) matches the serial XLA path."""
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, bc={"derivative": 0})  # stability 0.33
    res, ref, info = _solve_pair(
        eq, state, 0.5, 1e-3, monkeypatch, decomposition=[1, 1]
    )
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_sharded_ychunk_ext_kernel_single_chip(rng, monkeypatch):
    """The halo-extended Y-CHUNKED 3D kernel (round-5: deep temporal blocks
    on x-cut shards) Mosaic-compiles and matches the serial XLA path on a
    [1, 1, 1] mesh — the plane (128*256*4 B = 128 KB) exceeds the 96 KB
    threshold so the sharded driver auto-routes to it."""
    import pde_tpu.ops.pallas_cartesian as pc

    calls = []
    orig = pc._make_ychunk_multi_window_3d

    def spy(*args, **kwargs):
        if kwargs.get("ext_x"):
            calls.append(kwargs.get("band"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(pc, "_make_ychunk_multi_window_3d", spy)
    grid = pde.CartesianGrid([(0, 1)] * 3, (64, 128, 256))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, bc={"derivative": 0})
    res, ref, info = _solve_pair(
        eq, state, 0.1, 2e-4, monkeypatch, decomposition=[1, 1, 1]
    )
    assert info.get("fused_step") is True
    assert calls, "the halo-extended y-chunked kernel never engaged"
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_multi_field_expression_parity(rng, monkeypatch):
    """Coupled two-field expression PDE through the multi-field kernel."""
    grid = pde.UnitGrid([128, 128], periodic=True)
    u = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    v = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    u.label, v.label = "u", "v"
    state = pde.FieldCollection([u, v])
    eq = pde.PDE({
        "u": "0.1 * laplace(u) + 1 - 2 * u + u**2 * v",
        "v": "0.05 * laplace(v) + u - u**2 * v",
    })
    res, ref, info = _solve_pair(eq, state, 0.2, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    for a, b in zip(res, ref):
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.data), **F32_TOL
        )


def test_etdrk4_window(rng):
    """One compiled ETDRK4 window (rfft spectral step) runs on the chip."""
    grid = pde.UnitGrid([128, 128], periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng))
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
    res = eq.solve(state, t_range=0.5, dt=0.01, solver="etdrk4", tracker=None)
    assert np.asarray(res.data).dtype == np.float32
    assert np.all(np.isfinite(np.asarray(res.data)))


def test_etdrk4_dct_window(rng):
    """ETDRK4 through the DCT-II (no-flux) matmul basis on the chip."""
    grid = pde.UnitGrid([128, 128])
    state = _f32(pde.ScalarField.random_uniform(grid, -0.1, 0.1, rng=rng))
    eq = pde.PDE({"u": "0.05 * laplace(u) + u - u**3"}, bc={"derivative": 0})
    res = eq.solve(state, t_range=0.5, dt=0.01, solver="etdrk4", tracker=None)
    assert np.all(np.isfinite(np.asarray(res.data)))


def test_cylindrical_fused_parity(rng, monkeypatch):
    """Cylindrical kernel (per-row radial coefficients) on the chip."""
    grid = pde.CylindricalSymGrid(1.0, (0, 1), (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.005, bc={"derivative": 0})  # radial term: 0.25
    res, ref, info = _solve_pair(eq, state, 0.2, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_bf16_mxu_lane_path(rng, monkeypatch):
    """bf16 states fuse through the MXU lane-matmul path (rolls cannot
    compile bf16) and match the XLA lowering run at the SAME dtype.

    The oracle is the bf16 XLA path, not f32: bf16 time stepping loses
    sub-ulp increments regardless of which kernel runs, so only the
    same-dtype comparison isolates the kernel."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([256, 256], periodic=True)
    f32_state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    bf16_state = pde.ScalarField(
        grid, np.asarray(f32_state.data).astype("bfloat16")
    )
    eq = pde.DiffusionPDE(0.1)
    res16, ref16, info = _solve_pair(eq, bf16_state, 0.1, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res16.data, dtype=np.float32),
        np.asarray(ref16.data, dtype=np.float32),
        rtol=0.02, atol=0.02,  # same-dtype runs, different rounding order
    )
    # coarse sanity against the f32 trajectory (bf16 drift stays bounded)
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    solver32 = EulerSolver(eq)
    res32 = Controller(solver32, t_range=0.1, tracker=None).run(
        f32_state, dt=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res16.data, dtype=np.float32),
        np.asarray(res32.data),
        rtol=0.3, atol=0.05,
    )


def test_sde_kernel_noise_window(rng, monkeypatch):
    """In-kernel hardware-PRNG SDE window: deterministic per key, correct
    variance statistics vs the XLA path, and faster-path engagement."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([512, 512], periodic=True)
    state = pde.ScalarField(grid, np.zeros((512, 512), np.float32))
    with pde.config({"sde.increment_dist": "irwin4"}):
        eq = pde.DiffusionPDE(
            diffusivity=0.1, noise=1.0, rng=np.random.default_rng(5)
        )
        # determinism: the stream is a pure function of (key, step, row)
        solver = EulerSolver(eq)
        solver._key = jax.random.key(7)
        out1, _ = solver.make_stepper(state, dt=1e-4)(state, 0.0, 0.1)
        assert solver.info.get("fused_step") is True
        solver2 = EulerSolver(eq)
        solver2._key = jax.random.key(7)
        out2, _ = solver2.make_stepper(state, dt=1e-4)(state, 0.0, 0.1)
        np.testing.assert_array_equal(
            np.asarray(out1.data), np.asarray(out2.data)
        )
    # statistics match the XLA Gaussian path (weak order 1: additive-noise
    # diffusion variance is distribution-independent)
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    eqr = pde.DiffusionPDE(
        diffusivity=0.1, noise=1.0, rng=np.random.default_rng(6)
    )
    ref = eqr.solve(state, t_range=0.1, dt=1e-4, tracker=None)
    assert abs(
        float(np.var(np.asarray(out1.data)))
        / float(np.var(np.asarray(ref.data))) - 1.0
    ) < 0.05


def test_fused_3d_inhomogeneous_bc_parity(rng, monkeypatch):
    """3D BC value staging must Mosaic-compile: the y-side (R, 1, nz)
    middle-dim-1 DMA slice and the z-side (R, ny, 128) lane-broadcast
    block are layouts interpret mode cannot validate (the 2D hardware
    lane already caught a width-1 memref rejection)."""
    grid = pde.CartesianGrid([(0, 1)] * 3, (64, 64, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    vals_y = np.linspace(-1.0, 1.0, 64 * 128).reshape(64, 128)
    vals_z = np.linspace(0.0, 2.0, 64 * 64).reshape(64, 64)
    bc = {"x": {"derivative": 0},
          "y-": {"value": vals_y}, "y+": {"derivative": 0},
          "z-": {"value": vals_z}, "z+": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.25
    res, ref, info = _solve_pair(eq, state, 0.2, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_3d_time_dependent_bc_parity(rng, monkeypatch):
    """3D per-step SMEM t-table on the chip (x-side plane + t expression)."""
    grid = pde.CartesianGrid([(0, 1)] * 3, (64, 64, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    vals_x = np.linspace(-0.5, 0.5, 64 * 128).reshape(64, 128)
    bc = {"x-": {"value": vals_x}, "x+": {"derivative": 0},
          "y-": {"value_expression": "sin(3 * t)"}, "y+": {"derivative": 0},
          "z": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.25
    res, ref, info = _solve_pair(eq, state, 0.2, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_sde_kernel_noise_bc_side_inputs(rng, monkeypatch):
    """The in-kernel-PRNG SDE window (hardware-only: pltpu.prng_seed has no
    interpret lowering) stages array/t-dependent BC consts.

    Two checks, decomposed so each has a valid oracle (round-3 lane
    failure: the old single-realization mean-profile comparison was
    statistically void — with noise=0.5, dt=1e-4, cell_vol=3.05e-5 each
    row-mean is a random walk of std sqrt(noise*dt/cell_vol/n_cols*steps)
    ≈ 1.8, so two INDEPENDENT streams can never agree at atol=0.05; the
    observed 'near-sign-flip' was just two mean-zero random profiles):

    1. deterministic BC drift — run the SAME kernel-noise window with the
       increment scale forced to 0 (PRNG seeding/generation and all BC
       side-input staging still execute) against the XLA noise-free path;
       must match to f32 tolerance;
    2. noise law — variance ratio vs an independent XLA realization.
    """
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (256, 256))
    state = pde.ScalarField(grid, np.zeros((256, 256), np.float32))
    vals = np.linspace(-1.0, 1.0, 256)
    bc = {"x-": {"value": vals}, "x+": {"derivative": 0},
          "y-": {"value_expression": "sin(3 * t)"}, "y+": {"derivative": 0}}
    import pde_tpu.models.pde as mpde
    from pde_tpu.solvers.euler import EulerSolver

    # -- 1. deterministic BC drift through the kernel-noise window --------
    orig_spec = mpde.PDE._sde_kernel_noise_spec

    def zero_scale_spec(self, grid_, dt_, interpret):
        spec = orig_spec(self, grid_, dt_, interpret)
        return dict(spec, scale=0.0) if spec is not None else None

    monkeypatch.setattr(mpde.PDE, "_sde_kernel_noise_spec", zero_scale_spec)
    # explicit-Euler stability: D*dt*(1/dx^2 + 1/dy^2) = 0.082 << 0.5
    with pde.config({"sde.increment_dist": "irwin4"}):
        eq0 = pde.DiffusionPDE(diffusivity=0.01, noise=0.5, bc=bc,
                               rng=np.random.default_rng(5))
        solver0 = EulerSolver(eq0)
        det, _ = solver0.make_stepper(state, dt=1e-4)(state, 0.0, 0.05)
        assert solver0.info.get("fused_step") is True
    monkeypatch.setattr(mpde.PDE, "_sde_kernel_noise_spec", orig_spec)
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    eq_det = pde.DiffusionPDE(diffusivity=0.01, noise=0.0, bc=bc)
    ref_det = eq_det.solve(state, t_range=0.05, dt=1e-4, tracker=None)
    np.testing.assert_allclose(
        np.asarray(det.data), np.asarray(ref_det.data), **F32_TOL
    )

    # -- 2. noise law: variance vs an independent XLA realization ---------
    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    with pde.config({"sde.increment_dist": "irwin4"}):
        eq = pde.DiffusionPDE(diffusivity=0.01, noise=0.5, bc=bc,
                              rng=np.random.default_rng(5))
        solver = EulerSolver(eq)
        out, _ = solver.make_stepper(state, dt=1e-4)(state, 0.0, 0.05)
        assert solver.info.get("fused_step") is True
    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    eqr = pde.DiffusionPDE(diffusivity=0.01, noise=0.5, bc=bc,
                           rng=np.random.default_rng(6))
    ref = eqr.solve(state, t_range=0.05, dt=1e-4, tracker=None)
    assert abs(
        float(np.var(np.asarray(out.data)))
        / float(np.var(np.asarray(ref.data))) - 1.0
    ) < 0.1


def test_fused_array_factor_bc_parity(rng, monkeypatch):
    """Array-factor Robin BCs (per-point gamma staged as bc_factors) must
    Mosaic-compile and match XLA on the chip."""
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    gam = np.linspace(0.5, 2.0, 128)
    bc = {"x-": {"type": "mixed", "value": gam, "const": 0.3},
          "x+": {"derivative": 0},
          "y-": {"type": "mixed", "value": gam[::-1].copy(), "const": -0.2},
          "y+": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.20
    res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_3d_space_time_bc_parity(rng, monkeypatch):
    """3D xt staging uses rank-4 step-indexed DMA blocks ((k, X, 1, nz)
    and (k, X, ny, 128)) — layouts only the chip can validate."""
    grid = pde.CartesianGrid([(0, 1)] * 3, (64, 64, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    bc = {"x": {"derivative": 0},
          "y-": {"value_expression": "sin(z - 2 * t)"},
          "y+": {"derivative": 0},
          "z-": {"value_expression": "cos(x + t)"}, "z+": {"derivative": 0}}
    # stability: D*dt*sum(1/dx^2) = 0.01*1e-3*24576 = 0.25 < 0.5 (D=0.05
    # was unstable — both paths NaN'd, and allclose treats NaN==NaN as
    # equal, so the parity assert would pass vacuously; hardware finding)
    eq = pde.DiffusionPDE(0.01, bc=bc)
    res, ref, info = _solve_pair(eq, state, 0.2, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    assert np.isfinite(np.asarray(res.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )

def test_fused_rk4_parity(rng, monkeypatch):
    """The fused fixed-dt RK4 window (4 rhs stages per step in VMEM) must
    Mosaic-compile and match the XLA RK4 stepper on silicon."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.runge_kutta import RungeKuttaSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([256, 256], periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.1)
    solver = RungeKuttaSolver(eq, adaptive=False)
    res = Controller(solver, t_range=1.0, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref_solver = RungeKuttaSolver(eq, adaptive=False)
    ref = Controller(ref_solver, t_range=1.0, tracker=None).run(state, dt=1e-3)
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_rk4_noflux_parity(rng, monkeypatch):
    """Fused RK4 with physical-BC ghost fixups in every stage, on silicon."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.runge_kutta import RungeKuttaSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.CartesianGrid([(0, 1), (0, 1)], (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, bc={"derivative": 0})  # stability 0.33
    solver = RungeKuttaSolver(eq, adaptive=False)
    res = Controller(solver, t_range=0.5, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref_solver = RungeKuttaSolver(eq, adaptive=False)
    ref = Controller(ref_solver, t_range=0.5, tracker=None).run(state, dt=1e-3)
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )

def test_fused_rk4_t_dependent_bc_parity(rng, monkeypatch):
    """Fused RK4 with a sin(t) Dirichlet value: the (step, stage) SMEM
    t-table binds ghost values at t, t+dt/2, t+dt on silicon (round-5
    feature; the reference re-evaluates BCs per rhs call,
    `/root/reference/pde/backends/numba/_solvers.py:67-120`)."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.runge_kutta import RungeKuttaSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    bc = {"x": {"derivative": 0},
          "y-": {"value_expression": "sin(3 * t)"}, "y+": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.20
    solver = RungeKuttaSolver(eq, adaptive=False)
    res = Controller(solver, t_range=0.5, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref_solver = RungeKuttaSolver(eq, adaptive=False)
    ref = Controller(ref_solver, t_range=0.5, tracker=None).run(state, dt=1e-3)
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_time_dependent_gamma_parity(rng, monkeypatch):
    """Mixed BCs with gamma varying in TIME: the ghost coefficient reads
    the per-step SMEM t-table on silicon (round-4 feature closing the last
    lowerable BC fallback)."""
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    bc = {"x-": {"type": "mixed_expression", "value": "1 + 0.5*sin(3*t)",
                 "const": 0.2},
          "x+": {"derivative": 0},
          "y-": {"type": "mixed_expression", "value": "2 - cos(t)",
                 "const": "0.1*t"},
          "y+": {"derivative": 0}}
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.20
    res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_pallas_operator_registry_on_chip(rng, monkeypatch):
    """The standalone backend='pallas' operator kernels (gradient,
    gradient_squared, divergence, vector_laplace) Mosaic-compile and match
    the XLA factories on silicon."""
    from pde_tpu.backends import get_backend

    monkeypatch.delenv("PDE_TPU_PALLAS_INTERPRET", raising=False)
    backend = get_backend("pallas")
    grid = pde.UnitGrid([256, 256], periodic=True)
    field = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    data = np.asarray(field.data, np.float32)
    for op_name in ("laplace", "gradient", "gradient_squared"):
        op_p = backend.make_operator(grid, op_name, bc="periodic")
        ref = grid.make_operator(op_name, bc="periodic")(data)
        np.testing.assert_allclose(
            np.asarray(op_p(data)), np.asarray(ref), rtol=1e-5, atol=1e-5,
        )
    vec = np.stack([data, data[::-1].copy()])
    for op_name in ("divergence", "vector_laplace", "vector_gradient"):
        op_p = backend.make_operator(grid, op_name, bc="periodic")
        ref = grid.make_operator(op_name, bc="periodic")(vec)
        np.testing.assert_allclose(
            np.asarray(op_p(vec)), np.asarray(ref), rtol=1e-5, atol=1e-5,
        )
    tens = np.stack([vec, vec[::-1] * 0.5])  # rank-2 (2, 2, n, n)
    op_t = backend.make_operator(grid, "tensor_divergence", bc="periodic")
    ref_t = grid.make_operator("tensor_divergence", bc="periodic")(tens)
    np.testing.assert_allclose(
        np.asarray(op_t(tens)), np.asarray(ref_t), rtol=1e-5, atol=1e-5,
    )
    # affine physical BCs in the standalone kernels
    grid_n = pde.CartesianGrid([(0, 1), (0, 2)], (128, 128))
    f_n = _f32(pde.ScalarField.random_uniform(grid_n, rng=rng))
    bc_n = {"x-": {"value": 0.3}, "x+": {"derivative": 0},
            "y": {"derivative": 0.1}}
    op_n = backend.make_operator(grid_n, "gradient_squared", bc=bc_n)
    ref_n = grid_n.make_operator("gradient_squared", bc=bc_n)(
        np.asarray(f_n.data)
    )
    np.testing.assert_allclose(
        np.asarray(op_n(np.asarray(f_n.data, np.float32))),
        np.asarray(ref_n), rtol=1e-5, atol=1e-5,
    )

def test_cylindrical_divergence_gradient_parity(rng, monkeypatch):
    """Cylindrical divergence(gradient(...)) composition (v_r/r from the
    in-kernel global row index) on silicon."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.CylindricalSymGrid(1.0, (0, 1), (128, 128))
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.PDE({"c": "0.005 * divergence(gradient(c))"},
                 bc={"derivative": 0})
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=0.2, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=0.2, dt=1e-3, tracker=None)
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


@pytest.mark.parametrize(
    "periodic, bc",
    [
        (True, None),
        (
            [True, False, True],
            {"x": "periodic", "y-": {"value": 0.2},
             "y+": {"derivative": 0.0}, "z": "periodic"},
        ),
        # per-face ARRAY value (round-5: wrap-padded DMA-sliced staging)
        (
            [True, False, True],
            {"x": "periodic", "y-": {"value": "sin(4 * x) * cos(z)"},
             "y+": {"derivative": 0.0}, "z": "periodic"},
        ),
        # SPACE-TIME value table (round-5: step-indexed xt tables through
        # the same padded-block DMA slicing, one extra leading k dim)
        (
            [True, False, True],
            {"x": "periodic",
             "y-": {"value_expression": "sin(4 * x) * cos(2 * t)"},
             "y+": {"derivative": 0.0}, "z": "periodic"},
        ),
    ],
    ids=["periodic", "mixed", "array-face", "space-time"],
)
def test_fused_3d_ychunk_parity(periodic, bc, rng, monkeypatch):
    """Large (y, z) planes auto-route to the y-chunked kernel (2D pallas
    grid, nine wrapped halo DMAs, shifted-slice y neighbors) — its Mosaic
    lowering and edge-flag fixups only the chip validates."""
    import pde_tpu.ops.pallas_cartesian as pc

    calls = []
    orig = pc._make_ychunk_multi_window_3d

    def spy(*args, **kwargs):
        calls.append(kwargs.get("band"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(pc, "_make_ychunk_multi_window_3d", spy)
    # (y, z) plane = 128*256*4 B = 128 KB > the 96 KB auto threshold
    grid = pde.CartesianGrid([(0, 1)] * 3, (64, 128, 256), periodic=periodic)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, **({} if bc is None else {"bc": bc}))
    res, ref, info = _solve_pair(eq, state, 0.1, 2e-4, monkeypatch)
    assert info.get("fused_step") is True
    assert calls, "y-chunked kernel never engaged"
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_3d_ychunk_expression_parity(rng, monkeypatch):
    """The expression compiler's 3D route (make_chunked_multi_window_3d)
    also auto-chunks; Allen-Cahn is the benchmark config."""
    import pde_tpu.ops.pallas_cartesian as pc

    calls = []
    orig = pc._make_ychunk_multi_window_3d

    def spy(*args, **kwargs):
        calls.append(kwargs.get("band"))
        return orig(*args, **kwargs)

    monkeypatch.setattr(pc, "_make_ychunk_multi_window_3d", spy)
    grid = pde.UnitGrid([64, 128, 256], periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng) - 0.5)
    eq = pde.PDE({"u": "laplace(u) + u - u**3"})
    res, ref, info = _solve_pair(eq, state, 5.0, 0.05, monkeypatch)
    assert info.get("fused_step") is True
    assert calls, "y-chunked kernel never engaged"
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_vector_state_expression_parity(rng, monkeypatch):
    """Rank-1 state through the multi-field kernel (component planes) on
    silicon: vector Ginzburg-Landau with coupling via dot()."""
    from pde_tpu.solvers.controller import Controller
    from pde_tpu.solvers.euler import EulerSolver

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([128, 128], periodic=True)
    state = pde.VectorField(
        grid,
        np.asarray(
            rng.uniform(-0.5, 0.5, size=(2, 128, 128)), dtype=np.float32
        ),
    )
    eq = pde.PDE({"u": "0.2 * vector_laplace(u) + u - dot(u, u) * u"})
    solver = EulerSolver(eq)
    res = Controller(solver, t_range=1.0, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref = eq.solve(state, t_range=1.0, dt=1e-3, tracker=None)
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_ab2_parity(rng, monkeypatch):
    """Fused fixed-dt Adams-Bashforth window on silicon: the carried
    previous-rate plane rides as an extra field of the multi-field kernel
    (round-5 feature; reference compiles AB in its fastest engine,
    `/root/reference/pde/backends/numba/_solvers.py:469`). Covers the
    backward-Euler bootstrap + cross-window rate carry on the chip."""
    from pde_tpu.solvers.adams_bashforth import AdamsBashforthSolver
    from pde_tpu.solvers.controller import Controller

    monkeypatch.delenv("PDE_TPU_DISABLE_FUSED", raising=False)
    grid = pde.UnitGrid([128, 128], periodic=True)
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.1)
    solver = AdamsBashforthSolver(eq)
    res = Controller(solver, t_range=1.0, tracker=None).run(state, dt=1e-3)
    assert solver.info.get("fused_step") is True

    monkeypatch.setenv("PDE_TPU_DISABLE_FUSED", "1")
    ref_solver = AdamsBashforthSolver(eq)
    ref = Controller(ref_solver, t_range=1.0, tracker=None).run(
        state, dt=1e-3
    )
    assert ref_solver.info.get("fused_step") is None
    for f in (res, ref):
        assert np.isfinite(np.asarray(f.data)).all()
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )


def test_fused_space_gamma_parity(rng, monkeypatch):
    """Mixed BCs with gamma varying in SPACE via an expression: the
    factory-time boundary-coordinate evaluation bridges to the array-factor
    staging (round-5 bridge; reference `local.py:1781,2064`) — the staged
    per-point ghost coefficients must Mosaic-compile and match XLA."""
    grid = pde.CartesianGrid([(0, 1), (0, 2)], (128, 128))
    bc = {"x-": {"type": "mixed_expression", "value": "1 + y", "const": 0.2},
          "x+": {"derivative": 0},
          "y-": {"type": "mixed_expression", "value": "x**2", "const": "x"},
          "y+": {"derivative": 0}}
    state = _f32(pde.ScalarField.random_uniform(grid, rng=rng))
    eq = pde.DiffusionPDE(0.01, bc=bc)  # stability 0.20
    res, ref, info = _solve_pair(eq, state, 0.5, 1e-3, monkeypatch)
    assert info.get("fused_step") is True
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(ref.data), **F32_TOL
    )
