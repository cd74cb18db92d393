"""Exponential time differencing RK4 (ETDRK4) — a TPU-native stiff solver.

For semilinear PDEs ``u_t = L u + N(u)`` with a stiff linear part that is
diagonal in a separable modal basis (laplace chains on Cartesian grids —
diffusion, Cahn-Hilliard, Kuramoto-Sivashinsky, Swift-Hohenberg, coupled
reaction-diffusion systems), the linear part is integrated EXACTLY via
``exp(h L)`` and only the nonlinearity is treated with a 4th-order
Runge-Kutta scheme (Cox & Matthews 2002). The stability restriction of
explicit stepping on the stiff operator (dt ~ dx² for diffusion, dx⁴ for
biharmonic terms) disappears: dt is limited by accuracy on the nonlinearity
alone, typically orders of magnitude larger.

The modal basis is per-axis: rfft modes on periodic axes, DCT-II modes on
homogeneous-Neumann axes, and DST-II modes on homogeneous-Dirichlet axes —
the exact eigenbases of the cell-centered ghost-cell stencils, applied as
orthonormal matmuls (MXU-friendly; inverses are transposes). Coupled
N-field systems diagonalize the per-mode ``(N, N)`` coupling matrix on the
host (batched eigendecomposition) and evaluate the phi functions on its
eigenvalues.

The phi-function coefficients are evaluated with the Kassam & Trefethen
(2005) complex contour quadrature (numerically stable near ``h L → 0``) on
the host; each step then costs a handful of elementwise spectral products
plus the forward/inverse transforms, all inside the compiled window loop.

There is no reference equivalent: py-pde handles stiff problems by handing
the rhs to scipy's implicit host-side integrators
(`/root/reference/pde/solvers/scipy.py:17`), leaving compiled code entirely.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.base import FieldBase
from .base import SolverBase


def _phi_scalars(mu: np.ndarray, n_points: int = 64):
    """ETDRK4 phi values on (possibly complex) ``mu = dt * eigenvalue``.

    Contour quadrature on a unit circle around each value (Kassam &
    Trefethen 2005, eq. 2.5) — the naive closed forms lose all precision for
    ``|mu|`` near 0. Returns the RAW phi quadratures (call sites scale by
    ``dt``); complex for complex input. ``E``/``E2`` are exact exponentials.
    """
    mu = np.asarray(mu)
    complex_in = np.iscomplexobj(mu)
    E = np.exp(mu)
    E2 = np.exp(mu / 2)
    Q = np.zeros(mu.shape, dtype=complex)
    f1 = np.zeros(mu.shape, dtype=complex)
    f2 = np.zeros(mu.shape, dtype=complex)
    f3 = np.zeros(mu.shape, dtype=complex)
    # real input: points on the upper half circle + taking the real part is
    # equivalent to (and half the cost of) the full circle
    points = n_points if complex_in else n_points
    for m in range(points):
        if complex_in:
            r = np.exp(2j * np.pi * (m + 0.5) / points)
        else:
            r = np.exp(1j * np.pi * (m + 0.5) / points)
        z = mu + r
        ez = np.exp(z)
        Q += (np.exp(z / 2) - 1) / z
        z3 = z**3
        f1 += (-4 - z + ez * (4 - 3 * z + z**2)) / z3
        f2 += (2 + z + ez * (-2 + z)) / z3
        f3 += (-4 - 3 * z - z**2 + ez * (4 - z)) / z3
    scale = 1.0 / points
    out = (Q * scale, f1 * scale, f2 * scale, f3 * scale)
    if not complex_in:
        out = tuple(o.real for o in out)
    return (E, E2, *out)


def _phi_coefficients(L: np.ndarray, dt: float, n_points: int = 64):
    """Scalar-field coefficient arrays: real f64, scaled by dt."""
    E, E2, Q, f1, f2, f3 = _phi_scalars(dt * np.asarray(L, dtype=np.float64),
                                        n_points)
    return E, E2, dt * Q, dt * f1, dt * f2, dt * f3


def _phi_coefficient_matrices(L: np.ndarray, dt: float, n_points: int = 64):
    """Coupled-system coefficients: per-mode matrix functions of ``dt L``.

    ``L`` has shape ``(*modes, N, N)`` (real). Diagonalizes every mode with
    a batched eigendecomposition and assembles ``V f(dt µ) V⁻¹``; raises
    NotImplementedError for (numerically) defective coupling matrices, where
    the eigenvector basis cannot represent the matrix functions.
    """
    shape = L.shape
    N = shape[-1]
    M = (dt * np.asarray(L, dtype=np.float64)).reshape(-1, N, N)
    mu, V = np.linalg.eig(M)
    cond = np.linalg.cond(V)
    if not np.all(np.isfinite(cond)) or np.max(cond) > 1e8:
        raise NotImplementedError(
            "ETDRK4: the linear coupling matrix is (near-)defective; its "
            "matrix exponential cannot be computed by diagonalization"
        )
    Vinv = np.linalg.inv(V)
    E_e, E2_e, Q_e, f1_e, f2_e, f3_e = _phi_scalars(mu, n_points)

    def assemble(diag_vals, scale=1.0):
        mats = np.einsum("kij,kj,kjl->kil", V, scale * diag_vals, Vinv)
        return mats.real.reshape(shape)

    return (
        assemble(E_e),
        assemble(E2_e),
        assemble(Q_e, dt),
        assemble(f1_e, dt),
        assemble(f2_e, dt),
        assemble(f3_e, dt),
    )


def _make_transforms(grid, axis_kinds, real_dtype):
    """(forward, inverse, spectral_shape) for the per-axis modal bases.

    Periodic axes use one ``rfftn`` (the real half on the LAST periodic
    axis, matching the eigenvalue layout of ``make_etdrk_parts``);
    Neumann/Dirichlet axes apply orthonormal DCT-II/DST-II matrices as
    matmuls along the axis (inverse = transpose) — MXU work instead of FFTs.
    """
    from ..ops.common import dct2_matrix, dst2_matrix

    num_axes = grid.num_axes
    periodic_axes = [
        ax for ax, kind in enumerate(axis_kinds) if kind == "periodic"
    ]
    matrix_axes = [
        (ax, kind)
        for ax, kind in enumerate(axis_kinds)
        if kind != "periodic"
    ]
    fft_sizes = [grid.shape[ax] for ax in periodic_axes]
    mats = {}
    for ax, kind in matrix_axes:
        n = grid.shape[ax]
        m = dct2_matrix(n) if kind == "neumann" else dst2_matrix(n)
        mats[ax] = jnp.asarray(m, dtype=real_dtype)

    spectral_shape = list(grid.shape)
    if periodic_axes:
        spectral_shape[periodic_axes[-1]] = (
            grid.shape[periodic_axes[-1]] // 2 + 1
        )
    spectral_shape = tuple(spectral_shape)

    def apply_matrix(m, u, ax):
        moved = jnp.moveaxis(u, ax, -1)
        out = moved @ m.T if not jnp.iscomplexobj(moved) else (
            (moved.real @ m.T) + 1j * (moved.imag @ m.T)
        )
        return jnp.moveaxis(out, -1, ax)

    def forward(u):
        for ax, _ in matrix_axes:
            u = apply_matrix(mats[ax], u, ax)
        if periodic_axes:
            u = jnp.fft.rfftn(u, axes=periodic_axes)
        return u

    def inverse(v):
        if periodic_axes:
            v = jnp.fft.irfftn(v, s=fft_sizes, axes=periodic_axes)
        for ax, _ in matrix_axes:
            v = apply_matrix(mats[ax].T, v, ax)
        return v

    return forward, inverse, spectral_shape, bool(periodic_axes)


def _make_sharded_transforms(mesh, axis_kinds, real_dtype):
    """Transforms between LOCAL shard blocks and a spectral layout that is
    FULL along periodic axes and LOCAL along matrix axes (for use INSIDE
    ``shard_map``).

    ETDRK4 operates in global modal space — a transform couples every point
    along its axis — so decomposed axes are ``all_gather``-ed (riding ICI)
    before the transform, exactly what XLA's SPMD partitioner does for FFT
    ops. Gathering keeps sharded runs BIT-identical to serial (the same
    ``rfftn``/matmul runs on the same global data); the real-space
    nonlinear remainder and the state stay sharded throughout the window.
    ``slice_coeff`` cuts a host-precomputed GLOBAL spectral coefficient
    array down to this shard's matrix-axis block by ``lax.axis_index`` —
    the framework's shard-varying-data rule (see ``grids.base`` traced
    helpers).
    """
    from ..ops.common import dct2_matrix, dst2_matrix

    grid = mesh.basegrid
    sub = mesh.subgrid
    names = mesh.axis_names
    counts = tuple(mesh.decomposition)
    periodic_axes = [
        ax for ax, kind in enumerate(axis_kinds) if kind == "periodic"
    ]
    matrix_axes = [
        (ax, kind) for ax, kind in enumerate(axis_kinds) if kind != "periodic"
    ]
    fft_sizes = [grid.shape[ax] for ax in periodic_axes]
    mats = {}
    for ax, kind in matrix_axes:
        n = grid.shape[ax]
        m = dct2_matrix(n) if kind == "neumann" else dst2_matrix(n)
        mats[ax] = jnp.asarray(m, dtype=real_dtype)

    def gather_axis(u, ax):
        if counts[ax] == 1:
            return u
        # NOT all_gather: feeding an all_gather result (through elementwise
        # ops) into an fft inside the window's fori_loop trips an XLA CPU
        # miscompile — fft_thunk.cc RET_CHECK IsMonotonicWithDim0Major, the
        # gathered buffer keeps a non-major layout the fft thunk rejects.
        # Embedding the local block into zeros and psum-ing is an EXACT
        # gather (each element has exactly one contributor) on a fresh
        # default-layout buffer; revisit all_gather for real multi-chip
        # runs where the collective volume matters.
        full_shape = list(u.shape)
        full_shape[ax] = counts[ax] * u.shape[ax]
        starts = [jnp.int32(0)] * u.ndim
        starts[ax] = (
            jax.lax.axis_index(names[ax]).astype(jnp.int32) * u.shape[ax]
        )
        full = jax.lax.dynamic_update_slice(
            jnp.zeros(full_shape, u.dtype), u, starts
        )
        return jax.lax.psum(full, names[ax])

    def slice_axis(u, ax, size):
        if counts[ax] == 1:
            return u
        # dynamic_slice requires uniform index dtypes (axis_index is i32)
        starts = [jnp.int32(0)] * u.ndim
        starts[ax] = jax.lax.axis_index(names[ax]).astype(jnp.int32) * size
        sizes = list(u.shape)
        sizes[ax] = size
        return jax.lax.dynamic_slice(u, starts, sizes)

    def apply_matrix(m, u, ax):
        # gather EVERY decomposed axis, not just the transform axis: the
        # matmul must run at the serial operand shape — XLA's dot reduction
        # order depends on the batch dims, so a locally-batched matmul is
        # one ulp off the serial result (measured), breaking bit-identity
        for gax in range(u.ndim):
            u = gather_axis(u, gax)
        moved = jnp.moveaxis(u, ax, -1)
        out = moved @ m.T if not jnp.iscomplexobj(moved) else (
            (moved.real @ m.T) + 1j * (moved.imag @ m.T)
        )
        out = jnp.moveaxis(out, -1, ax)
        for gax in range(u.ndim):
            out = slice_axis(out, gax, sub.shape[gax])
        return out

    def forward(u):
        for ax, _ in matrix_axes:
            u = apply_matrix(mats[ax], u, ax)
        if periodic_axes:
            for ax in periodic_axes:
                u = gather_axis(u, ax)
            u = jnp.fft.rfftn(u, axes=periodic_axes)
        return u

    def inverse(v):
        if periodic_axes:
            v = jnp.fft.irfftn(v, s=fft_sizes, axes=periodic_axes)
            for ax in periodic_axes:
                v = slice_axis(v, ax, sub.shape[ax])
        for ax, _ in matrix_axes:
            v = apply_matrix(mats[ax].T, v, ax)
        return v

    def slice_coeff(c):
        # c: GLOBAL spectral-shape array (mode dims lead; coupled systems
        # carry trailing (N, N) dims) — cut the matrix-axis dims local
        for ax, _ in matrix_axes:
            c = slice_axis(c, ax, sub.shape[ax])
        return c

    return forward, inverse, slice_coeff


class ETDRK4Solver(SolverBase):
    """Exponential time differencing RK4 for stiff semilinear PDEs.

    Requires a PDE exposing ``make_etdrk_parts`` (the expression
    :class:`~pde_tpu.models.pde.PDE` does) with scalar fields — a single
    field or a coupled FieldCollection — on a CartesianGrid whose axes are
    periodic or carry homogeneous Neumann/Dirichlet conditions.
    Deterministic and fixed-dt.
    """

    name = "etdrk4"
    dt_default = 1e-2
    # Decomposed runs (``decomposition=[...]``) use the same shard_map
    # window as the explicit solvers: the nonlinear remainder evaluates on
    # ShardedBoundaries subgrids (ppermute halos), transform axes are
    # gathered exactly (see _make_sharded_transforms), and spectral
    # coefficients are host-precomputed GLOBAL arrays cut per shard by
    # lax.axis_index. Periodic (FFT) axes are bit-identical to serial;
    # DCT/DST matmul axes agree to ~2 ulp (XLA:CPU selects layout-dependent
    # gemm lowerings inside the window loop; every component is bitwise in
    # isolation — pinned by tests/solvers/test_etdrk.py).

    def __init__(self, pde, *, backend: str = "auto", decomposition=None):
        super().__init__(pde, backend=backend, decomposition=decomposition)
        if self.info["stochastic"]:
            raise RuntimeError("ETDRK4 is deterministic; use an SDE solver")
        self._sharded_global_state = None

    def _make_fixed_stepper_sharded(self, state, dt, mesh):
        """Decomposed ETDRK4 runs under the SAME shard_map window as every
        other solver; only the single step is mesh-aware (see
        :meth:`_make_single_step_fixed_dt`).

        NOTE a GSPMD alternative (jit the GLOBAL step with sharding
        constraints and let XLA's partitioner place the collectives) was
        tried first and MISCOMPILES: the BC ghost-setter idiom
        ``full.at[:, 0].set(full[:, -2])`` produces wrong values at shard
        boundaries under the SPMD partitioner (observed on the CPU backend,
        maxdiff ~0.1 on a [1, 2] mesh) — the framework's operators must only
        decompose through shard_map with explicit collectives.
        """
        self._sharded_global_state = state
        try:
            return super()._make_fixed_stepper_sharded(state, dt, mesh)
        finally:
            self._sharded_global_state = None

    def _make_single_step_fixed_dt(self, state: FieldBase, dt: float) -> Callable:
        if not hasattr(self.pde, "make_etdrk_parts"):
            raise NotImplementedError(
                f"{self.pde.__class__.__name__} does not expose the spectral "
                "linear/nonlinear split required by ETDRK4 "
                "(make_etdrk_parts); use an expression PDE"
            )
        grid = state.grid
        mesh = getattr(grid, "_mesh", None)
        if mesh is None:
            parts = self.pde.make_etdrk_parts(state)
        else:
            # `state` is the shard-0 SUBGRID template (base sharded
            # stepper): modal eigenvalues/transforms must come from the
            # GLOBAL grid while the nonlinear remainder evaluates on the
            # subgrid (ShardedBoundaries halos inside shard_map)
            if self._sharded_global_state is None:
                raise RuntimeError(
                    "ETDRK4 subgrid steps are only built through the "
                    "sharded window stepper"
                )
            parts = self.pde.make_etdrk_parts(
                self._sharded_global_state, rhs_state=state
            )
        L_vals = parts.L_vals if hasattr(parts, "L_vals") else parts[0]
        nonlinear_rhs = (
            parts.nonlinear_rhs if hasattr(parts, "nonlinear_rhs") else parts[1]
        )
        axis_kinds = getattr(parts, "axis_kinds", None)
        n_fields = getattr(parts, "n_fields", 1)
        if axis_kinds is None:
            axis_kinds = ("periodic",) * grid.num_axes
        # coefficients are real; match the state's dtype so f32 states stay
        # f32/complex64 throughout (f64 coefficient arrays would promote
        # every product under x64)
        from ..models.base import state_leaves

        leaves0 = [np.asarray(x) for x in state_leaves(state)]
        if len(leaves0) != n_fields:
            raise NotImplementedError(
                "ETDRK4 state does not match the PDE's field count"
            )
        real_dtype = leaves0[0].dtype
        if any(np.issubdtype(np.asarray(x).dtype, np.complexfloating)
               for x in leaves0):
            raise NotImplementedError(
                "ETDRK4 operates on real fields; complex states "
                "are not supported"
            )
        if mesh is None:
            forward, inverse, _spec_shape, _has_fft = _make_transforms(
                grid, axis_kinds, real_dtype
            )

            def slice_coeff(c):
                return c
        else:
            forward, inverse, slice_coeff = _make_sharded_transforms(
                mesh, axis_kinds, real_dtype
            )
            self.info["etdrk_sharding"] = "shard_map+psum_gather"
        if n_fields == 1:
            coeffs = _phi_coefficients(L_vals, dt)
        else:
            coeffs = _phi_coefficient_matrices(L_vals, dt)
        E, E2, Q, f1, f2, f3 = (
            jnp.asarray(arr, dtype=real_dtype) for arr in coeffs
        )
        self.info["solver_scheme"] = "etdrk4 (Cox-Matthews / Kassam-Trefethen)"
        self.info["etdrk_axis_kinds"] = tuple(axis_kinds)

        if n_fields == 1:

            def N_hat(u, t):
                (rate,) = nonlinear_rhs([u], t)
                return forward(rate)

            def single_step(leaves, t, key):
                (u,) = leaves
                # on decomposed runs the spectral coefficients are GLOBAL
                # host arrays cut to this shard's matrix-axis block inside
                # the trace (identity on single-device runs)
                E_, E2_, Q_, f1_, f2_, f3_ = (
                    slice_coeff(c) for c in (E, E2, Q, f1, f2, f3)
                )
                v = forward(u)
                Nv = N_hat(u, t)
                a = E2_ * v + Q_ * Nv
                Na = N_hat(inverse(a), t + dt / 2)
                b = E2_ * v + Q_ * Na
                Nb = N_hat(inverse(b), t + dt / 2)
                c = E2_ * a + Q_ * (2 * Nb - Nv)
                Nc = N_hat(inverse(c), t + dt)
                v = E_ * v + f1_ * Nv + 2 * f2_ * (Na + Nb) + f3_ * Nc
                return [inverse(v)]

            return single_step

        # coupled system: spectral state is (*modes, N); coefficients apply
        # as per-mode (N, N) matvecs
        def mat(C, v):
            return jnp.einsum("...ij,...j->...i", C, v)

        def fwd_stack(leaves):
            return jnp.stack([forward(x) for x in leaves], axis=-1)

        def inv_unstack(v):
            return [inverse(v[..., i]) for i in range(n_fields)]

        def N_hat_multi(leaves, t):
            rates = nonlinear_rhs(leaves, t)
            return jnp.stack([forward(r) for r in rates], axis=-1)

        def single_step_multi(leaves, t, key):
            E_, E2_, Q_, f1_, f2_, f3_ = (
                slice_coeff(c) for c in (E, E2, Q, f1, f2, f3)
            )
            v = fwd_stack(leaves)
            Nv = N_hat_multi(leaves, t)
            a = mat(E2_, v) + mat(Q_, Nv)
            Na = N_hat_multi(inv_unstack(a), t + dt / 2)
            b = mat(E2_, v) + mat(Q_, Na)
            Nb = N_hat_multi(inv_unstack(b), t + dt / 2)
            c = mat(E2_, a) + mat(Q_, 2 * Nb - Nv)
            Nc = N_hat_multi(inv_unstack(c), t + dt)
            v = mat(E_, v) + mat(f1_, Nv) + 2 * mat(f2_, Na + Nb) + mat(f3_, Nc)
            return inv_unstack(v)

        return single_step_multi
