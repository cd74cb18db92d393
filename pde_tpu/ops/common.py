"""Shared helpers for building differential operators.

Every operator factory has the signature ``factory(grid, bcs=None, **kwargs)`` and
returns a pure function. With boundary conditions, the function maps *valid* data
to valid data (``op(data, t=0.0, args=None)``); without (``bcs=None``), it maps
*full* data (including ghost cells) to valid data, mirroring the reference's
``make_operator`` / ``make_operator_no_bc`` split (`grids/base.py:1198,1153`).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..grids.base import (  # noqa: F401  (re-exported for operator modules)
    GridBase,
    axis_coords_traced,
    cell_coords_traced,
    cell_volumes_traced,
    local_slice_traced,
    radial_factor_traced,
)


def make_full_padder(grid: GridBase, rank: int) -> Callable:
    """Return a function padding valid data with one layer of ghost cells."""
    pads = [(0, 0)] * rank + [(1, 1)] * grid.num_axes

    def pad(data):
        return jnp.pad(jnp.asarray(data), pads)

    return pad


def wrap_with_bcs(grid: GridBase, bcs, rank_in: int, stencil: Callable) -> Callable:
    """Compose padding + ghost-cell setting + a stencil into one operator.

    `stencil` maps a full array to a valid-shaped result. XLA fuses the
    functional ghost updates into the stencil, so no extra memory traffic is
    incurred for the ghost layer beyond the padded array itself.
    """
    if bcs is None:

        def op_no_bc(full, t=0.0, args=None):
            return stencil(jnp.asarray(full))

        return op_no_bc

    pad = make_full_padder(grid, rank_in)
    ghost_setter = bcs.make_ghost_setter()

    def op(data, t=0.0, args=None):
        if args is not None and isinstance(args, dict) and "t" in args:
            # reference convention: time is forwarded via bc_args={"t": t}
            t = args["t"]
        full = pad(data)
        full = ghost_setter(full, t, args)
        return stencil(full)

    return op


def make_derivative(
    grid: GridBase, axis: int = 0, method: str = "central", bcs=None
) -> Callable:
    """Make a first-derivative operator along a single axis.

    Reference: `backends/numba/operators/common.py:19`.
    """
    if method not in {"central", "forward", "backward"}:
        raise ValueError(f"Unknown derivative method `{method}`")
    dx = float(grid.discretization[axis])
    n = grid.num_axes

    def sl(lo, hi):
        idx = [slice(1, -1)] * n
        idx[axis] = slice(lo, hi if hi != 0 else None)
        return tuple(idx)

    if method == "central":
        scale = 0.5 / dx
        hi_idx, lo_idx = sl(2, 0), sl(0, -2)
    elif method == "forward":
        scale = 1.0 / dx
        hi_idx, lo_idx = sl(2, 0), sl(1, -1)
    else:  # backward
        scale = 1.0 / dx
        hi_idx, lo_idx = sl(1, -1), sl(0, -2)

    def stencil(full):
        return (full[hi_idx] - full[lo_idx]) * scale

    return wrap_with_bcs(grid, bcs, 0, stencil)


def make_derivative2(grid: GridBase, axis: int = 0, bcs=None) -> Callable:
    """Make a second-derivative operator along a single axis.

    Reference: `backends/numba/operators/common.py:118`.
    """
    scale = float(grid.discretization[axis]) ** -2
    n = grid.num_axes

    def sl(lo, hi):
        idx = [slice(1, -1)] * n
        idx[axis] = slice(lo, hi if hi != 0 else None)
        return tuple(idx)

    hi_idx, mid_idx, lo_idx = sl(2, 0), sl(1, -1), sl(0, -2)

    def stencil(full):
        return (full[hi_idx] - 2 * full[mid_idx] + full[lo_idx]) * scale

    return wrap_with_bcs(grid, bcs, 0, stencil)


def laplace_eigenvalues_1d(n: int, dx: float, *, real_half: bool = False) -> np.ndarray:
    """Eigenvalues of the periodic 1D finite-difference Laplacian.

    ``-4 sin²(π k / n) / dx²`` over the fft (or, with ``real_half``, rfft)
    modes — the discrete spectrum shared by the FFT Poisson solver and the
    ETDRK exponential integrator, so both advance/solve exactly the
    semi-discretization of the stencil operators.
    """
    f_cyc = np.fft.rfftfreq(n, d=dx) if real_half else np.fft.fftfreq(n, d=dx)
    return -4.0 * np.sin(np.pi * f_cyc * dx) ** 2 / dx**2


def neumann_laplace_eigenvalues_1d(n: int, dx: float) -> np.ndarray:
    """Eigenvalues of the cell-centered FD Laplacian with homogeneous no-flux
    BCs (ghost = edge): ``-4 sin²(π k / (2n)) / dx²`` for the DCT-II modes
    ``cos(π k (i + ½) / n)``, k = 0..n-1."""
    k = np.arange(n)
    return -4.0 * np.sin(np.pi * k / (2 * n)) ** 2 / dx**2


def dirichlet_laplace_eigenvalues_1d(n: int, dx: float) -> np.ndarray:
    """Eigenvalues of the cell-centered FD Laplacian with homogeneous
    Dirichlet BCs (ghost = -edge): ``-4 sin²(π k / (2n)) / dx²`` for the
    DST-II modes ``sin(π k (i + ½) / n)``, k = 1..n."""
    k = np.arange(1, n + 1)
    return -4.0 * np.sin(np.pi * k / (2 * n)) ** 2 / dx**2


def dct2_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II analysis matrix ``M`` with rows = eigenvectors of
    the no-flux Laplacian: ``(M @ x)`` are the modal coefficients, ``M.T`` is
    the exact inverse. Applied as a matmul — on TPU the MXU makes the O(n²)
    transform competitive with FFT at these sizes, and it supports axes whose
    BCs rule out plain FFTs."""
    i = np.arange(n)
    k = np.arange(n)[:, None]
    m = np.cos(np.pi * k * (i + 0.5) / n)
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def dst2_matrix(n: int) -> np.ndarray:
    """Orthonormal DST-II analysis matrix (homogeneous-Dirichlet modes
    ``sin(π k (i + ½) / n)``, k = 1..n); inverse is the transpose."""
    i = np.arange(n)
    k = np.arange(1, n + 1)[:, None]
    m = np.sin(np.pi * k * (i + 0.5) / n)
    m[:-1] *= np.sqrt(2.0 / n)
    m[-1] *= np.sqrt(1.0 / n)
    return m
