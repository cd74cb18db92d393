"""Matrix-free elliptic (Poisson) solvers.

TPU-native replacement of the reference's scipy sparse-matrix route
(`/root/reference/pde/backends/scipy/operators/cartesian.py:34-473`): instead of
assembling sparse Laplacian matrices, the solver is matrix-free — fully periodic
Cartesian grids invert the *discrete* 5/7-point Laplacian eigenvalues in Fourier
space (exact, O(N log N) on the TPU's fast FFT), all other cases run BiCGStab
(`jax.scipy.sparse.linalg`) against the same fused laplace operator used
everywhere else, so boundary conditions are automatically consistent.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grids.base import GridBase
from ..grids.boundaries.local import DirichletBC, ExpressionBC, MixedBC
from ..grids.cartesian import CartesianGrid
from ..grids.cylindrical import CylindricalSymGrid
from ..grids.spherical import PolarSymGrid, SphericalSymGrid


def _is_singular(bcs) -> bool:
    """Whether the Laplacian with these BCs has the constant nullspace."""
    for bc in bcs.boundaries:
        if isinstance(bc, (DirichletBC, MixedBC)):
            return False
        if isinstance(bc, ExpressionBC) and bc._input.get("target") in ("value", "mixed"):
            return False
    return True


def _make_fft_poisson_solver(grid: CartesianGrid) -> Callable:
    """Exact solver of the discrete periodic Poisson problem via FFT."""
    from .common import laplace_eigenvalues_1d

    # eigenvalues of the 5/7-point Laplacian: -4 sin^2(pi k / N) / dx^2 per axis
    eig = np.zeros(grid.shape)
    for ax in range(grid.num_axes):
        n = grid.shape[ax]
        lam = laplace_eigenvalues_1d(n, float(grid.discretization[ax]))
        shape = [1] * grid.num_axes
        shape[ax] = n
        eig = eig + lam.reshape(shape)
    eig_safe = np.where(eig == 0, 1.0, eig)
    inv_eig = jnp.asarray(np.where(eig == 0, 0.0, 1.0 / eig_safe))

    def solve(rhs, t=0.0, args=None):
        rhs_hat = jnp.fft.fftn(jnp.asarray(rhs))
        u_hat = rhs_hat * inv_eig  # zero mode pinned to zero mean
        return jnp.real(jnp.fft.ifftn(u_hat))

    return solve


def _make_iterative_poisson_solver(
    grid: GridBase, bcs, *, tol: float = 1e-10, maxiter: int | None = None
) -> Callable:
    """BiCGStab against the (affine) laplace operator with fused BCs."""
    lap = grid.make_operator("laplace", bc=bcs, jit=False)
    singular = _is_singular(bcs)
    volumes = jnp.asarray(
        np.broadcast_to(grid.cell_volumes, grid.shape) / grid.volume
    )
    if maxiter is None:
        maxiter = 4 * int(np.prod(grid.shape))

    def solve(rhs, t=0.0, args=None):
        rhs = jnp.asarray(rhs)
        # laplace with inhomogeneous BCs is affine: lap(u) = A u + b
        b = lap(jnp.zeros_like(rhs), t, args)

        if singular:
            # regularize the constant nullspace: (A + <.>)(u) = rhs' with
            # volume-weighted mean; a compatible rhs' has zero mean
            def matvec(u):
                return lap(u, t, args) - b + jnp.sum(u * volumes)

            target = rhs - b
            target = target - jnp.sum(target * volumes)
        else:

            def matvec(u):
                return lap(u, t, args) - b

            target = rhs - b

        u, _info = jax.scipy.sparse.linalg.bicgstab(
            matvec, target, tol=tol, maxiter=maxiter
        )
        return u

    return solve


def _register_poisson(grid_cls):
    @grid_cls.register_operator("poisson_solver", rank_in=0, rank_out=0)
    def make_poisson_solver(grid, bcs=None, *, method: str = "auto", tol: float = 1e-10,
                            maxiter: int | None = None) -> Callable:
        """Solve lap(u) = rhs for u with the given boundary conditions."""
        if bcs is None:
            raise ValueError("Poisson solver requires boundary conditions")
        mesh = getattr(grid, "_mesh", None)
        if mesh is not None and any(n > 1 for n in mesh.decomposition):
            # a per-shard FFT/BiCGStab would solve on local data only; a
            # distributed elliptic solve needs global transforms/reductions
            raise NotImplementedError(
                "Poisson solves are not supported on decomposed grids"
            )
        if method == "auto":
            use_fft = isinstance(grid, CartesianGrid) and all(grid.periodic)
        else:
            use_fft = method == "fft"
        if use_fft:
            return _make_fft_poisson_solver(grid)
        return _make_iterative_poisson_solver(grid, bcs, tol=tol, maxiter=maxiter)

    return make_poisson_solver


for _cls in (CartesianGrid, PolarSymGrid, SphericalSymGrid, CylindricalSymGrid):
    _register_poisson(_cls)
