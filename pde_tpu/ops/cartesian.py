"""Differential operators on Cartesian grids (1-3D) as fused XLA stencils.

TPU-native re-design of the reference Cartesian operator set
(`/root/reference/pde/backends/numba/operators/cartesian.py` and
`backends/jax/operators/cartesian.py:95-660`): slicing-based central stencils
that XLA fuses with the functional ghost-cell updates. The hot Pallas path for
large grids lives in :mod:`pde_tpu.ops.pallas_cartesian`.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..grids.cartesian import CartesianGrid
from ..utils.config import config
from .common import wrap_with_bcs

_METHODS = {"central", "forward", "backward"}


def _slicer(num_axes: int):
    """Return a function building index tuples: offsets per axis (-1, 0, +1)."""

    def sl(*offsets):
        idx = []
        for off in offsets:
            if off == -1:
                idx.append(slice(0, -2))
            elif off == 0:
                idx.append(slice(1, -1))
            elif off == 1:
                idx.append(slice(2, None))
            else:
                raise ValueError(off)
        return tuple(idx)

    return sl


def _set_corner_points_2d(grid: CartesianGrid):
    """Functional corner-ghost setter for the 9-point stencil.

    Mirrors `backends/numba/operators/cartesian.py:36`.
    """
    periodic_x, periodic_y = grid.periodic

    def set_corners(full):
        if periodic_x:
            full = full.at[0, 0].set(full[-2, 0])
            full = full.at[-1, 0].set(full[1, 0])
            full = full.at[0, -1].set(full[-2, -1])
            full = full.at[-1, -1].set(full[1, -1])
        elif periodic_y:
            # NOTE: diverges from the reference on purpose — its periodic_y
            # branch wraps two corners the wrong way (`arr[-1, 0] = arr[-1, 1]`
            # / `arr[0, -1] = arr[0, -2]`, `numba/operators/cartesian.py:64`),
            # breaking the x/y transpose symmetry of the 9-point stencil.
            # Ghost column 0 wraps to the last interior column (-2) and ghost
            # column -1 wraps to the first interior column (1) for ALL rows.
            full = full.at[0, 0].set(full[0, -2])
            full = full.at[-1, 0].set(full[-1, -2])
            full = full.at[0, -1].set(full[0, 1])
            full = full.at[-1, -1].set(full[-1, 1])
        else:
            full = full.at[0, 0].set(0.5 * (full[0, 1] + full[1, 0]))
            full = full.at[-1, 0].set(0.5 * (full[-1, 1] + full[-2, 0]))
            full = full.at[0, -1].set(0.5 * (full[0, -2] + full[1, -1]))
            full = full.at[-1, -1].set(0.5 * (full[-1, -2] + full[-2, -1]))
        return full

    return set_corners


def _make_laplace_stencil(
    grid: CartesianGrid,
    corner_weight: float | None = None,
    *,
    skip_corner_setter: bool = False,
):
    """``skip_corner_setter``: the boundary object fills ghost corners
    itself (ShardedBoundaries — the serial local corner wrap is wrong on a
    cut axis)."""
    n = grid.num_axes
    scales = grid.discretization**-2
    sl = _slicer(n)

    if n == 1:
        (sx,) = scales

        def stencil(full):
            return (full[sl(-1)] - 2 * full[sl(0)] + full[sl(1)]) * sx

        return stencil

    if n == 2:
        if corner_weight is None:
            corner_weight = config["operators.cartesian.laplacian_2d_corner_weight"]
        sx, sy = scales
        if corner_weight == 0:

            def stencil(full):
                center = full[sl(0, 0)]
                lap_x = (full[sl(-1, 0)] - 2 * center + full[sl(1, 0)]) * sx
                lap_y = (full[sl(0, -1)] - 2 * center + full[sl(0, 1)]) * sy
                return lap_x + lap_y

            return stencil

        # 9-point stencil (w=1/2: Oono-Puri, w=1/3: Patra-Karttunen)
        w = float(corner_weight)
        dm2 = sx + sy
        weights = np.array(
            [
                [0.25 * dm2 * w, sx * (1 - w), 0.25 * dm2 * w],
                [sy * (1 - w), (sx + sy) * (w - 2), sy * (1 - w)],
                [0.25 * dm2 * w, sx * (1 - w), 0.25 * dm2 * w],
            ]
        )
        set_corners = (
            (lambda full: full) if skip_corner_setter
            else _set_corner_points_2d(grid)
        )

        def stencil(full):
            full = set_corners(full)
            total = None
            for i in range(3):
                for j in range(3):
                    term = weights[i, j] * full[sl(i - 1, j - 1)]
                    total = term if total is None else total + term
            return total

        return stencil

    if n == 3:
        sx, sy, sz = scales

        def stencil(full):
            center = 2 * full[sl(0, 0, 0)]
            lap_x = (full[sl(-1, 0, 0)] - center + full[sl(1, 0, 0)]) * sx
            lap_y = (full[sl(0, -1, 0)] - center + full[sl(0, 1, 0)]) * sy
            lap_z = (full[sl(0, 0, -1)] - center + full[sl(0, 0, 1)]) * sz
            return lap_x + lap_y + lap_z

        return stencil

    raise NotImplementedError(f"Laplace operator not implemented for {n} dimensions")


def _make_laplace_spectral(grid: CartesianGrid) -> Callable:
    """FFT-based Laplacian (continuous spectrum -|k|^2); periodic grids only.

    Reference: `backends/numba/operators/cartesian.py:232-331`.
    """
    if not all(grid.periodic):
        raise ValueError("Spectral Laplacian requires a fully periodic grid")
    k2 = np.zeros(grid.shape)
    for ax in range(grid.num_axes):
        ks = 2 * np.pi * np.fft.fftfreq(grid.shape[ax], grid.discretization[ax])
        shape = [1] * grid.num_axes
        shape[ax] = grid.shape[ax]
        k2 = k2 + (ks**2).reshape(shape)
    factor = jnp.asarray(-k2)

    def op(data, t=0.0, args=None):
        data = jnp.asarray(data)
        result = jnp.fft.ifftn(factor * jnp.fft.fftn(data))
        if not jnp.issubdtype(data.dtype, jnp.complexfloating):
            result = jnp.real(result).astype(data.dtype)
        return result

    return op


@CartesianGrid.register_operator("laplace", rank_in=0, rank_out=0)
def make_laplace(
    grid: CartesianGrid, bcs=None, *, corner_weight=None, spectral: bool = False
) -> Callable:
    """Laplacian with fused ghost-cell boundary conditions.

    With ``spectral=True`` (periodic grids only) the exact Fourier-space
    Laplacian is applied instead of the finite-difference stencil.
    """
    if spectral:
        return _make_laplace_spectral(grid)
    stencil = _make_laplace_stencil(
        grid, corner_weight,
        skip_corner_setter=getattr(bcs, "sets_corner_ghosts", False),
    )
    return wrap_with_bcs(grid, bcs, 0, stencil)


def _make_axis_diff(grid: CartesianGrid, axis: int, method: str):
    """Difference along one axis of a full array, returning valid-shaped data."""
    n = grid.num_axes
    dx = grid.discretization[axis]

    def sl(off):
        offs = [0] * n
        offs[axis] = off
        return _slicer(n)(*offs)

    if method == "central":
        hi, lo, scale = sl(1), sl(-1), 0.5 / dx
    elif method == "forward":
        hi, lo, scale = sl(1), sl(0), 1.0 / dx
    elif method == "backward":
        hi, lo, scale = sl(0), sl(-1), 1.0 / dx
    else:
        raise ValueError(f"Unknown derivative method `{method}`")

    def diff(full):
        return (full[hi] - full[lo]) * scale

    return diff


@CartesianGrid.register_operator("gradient", rank_in=0, rank_out=1)
def make_gradient(grid: CartesianGrid, bcs=None, *, method: str = "central") -> Callable:
    """Gradient: out[i] = ∂_i f."""
    diffs = [_make_axis_diff(grid, ax, method) for ax in range(grid.num_axes)]

    def stencil(full):
        return jnp.stack([d(full) for d in diffs])

    return wrap_with_bcs(grid, bcs, 0, stencil)


@CartesianGrid.register_operator("gradient_squared", rank_in=0, rank_out=0)
def make_gradient_squared(grid: CartesianGrid, bcs=None, *, central: bool = True) -> Callable:
    """Squared gradient magnitude |∇f|²."""
    n = grid.num_axes
    sl = _slicer(n)

    def axis_sl(axis, off):
        offs = [0] * n
        offs[axis] = off
        return sl(*offs)

    if central:
        scales = 0.25 / grid.discretization**2

        def stencil(full):
            total = None
            for ax in range(n):
                term = (full[axis_sl(ax, 1)] - full[axis_sl(ax, -1)]) ** 2 * scales[ax]
                total = term if total is None else total + term
            return total

    else:
        scales = 0.5 / grid.discretization**2

        def stencil(full):
            center = full[sl(*([0] * n))]
            total = None
            for ax in range(n):
                term = (
                    (full[axis_sl(ax, 1)] - center) ** 2
                    + (center - full[axis_sl(ax, -1)]) ** 2
                ) * scales[ax]
                total = term if total is None else total + term
            return total

    return wrap_with_bcs(grid, bcs, 0, stencil)


@CartesianGrid.register_operator("divergence", rank_in=1, rank_out=0)
def make_divergence(grid: CartesianGrid, bcs=None, *, method: str = "central") -> Callable:
    """Divergence: out = Σ_i ∂_i v_i."""
    diffs = [_make_axis_diff(grid, ax, method) for ax in range(grid.num_axes)]

    def stencil(full):
        total = None
        for ax, d in enumerate(diffs):
            term = d(full[ax])
            total = term if total is None else total + term
        return total

    return wrap_with_bcs(grid, bcs, 1, stencil)


def _vectorize(stencil: Callable, dim: int) -> Callable:
    def vectorized(full):
        return jnp.stack([stencil(full[i]) for i in range(dim)])

    return vectorized


@CartesianGrid.register_operator("vector_gradient", rank_in=1, rank_out=2)
def make_vector_gradient(grid: CartesianGrid, bcs=None, *, method: str = "central") -> Callable:
    """Vector gradient: out[i, j] = ∂_j v_i."""
    diffs = [_make_axis_diff(grid, ax, method) for ax in range(grid.num_axes)]

    def grad_scalar(full):
        return jnp.stack([d(full) for d in diffs])

    return wrap_with_bcs(grid, bcs, 1, _vectorize(grad_scalar, grid.dim))


@CartesianGrid.register_operator("vector_laplace", rank_in=1, rank_out=1)
def make_vector_laplace(grid: CartesianGrid, bcs=None) -> Callable:
    """Vector Laplacian: out[i] = ∇²v_i."""
    stencil = _make_laplace_stencil(
        grid, skip_corner_setter=getattr(bcs, "sets_corner_ghosts", False)
    )
    return wrap_with_bcs(grid, bcs, 1, _vectorize(stencil, grid.dim))


@CartesianGrid.register_operator("tensor_divergence", rank_in=2, rank_out=1)
def make_tensor_divergence(grid: CartesianGrid, bcs=None, *, method: str = "central") -> Callable:
    """Tensor divergence: out[i] = Σ_j ∂_j t_ij."""
    diffs = [_make_axis_diff(grid, ax, method) for ax in range(grid.num_axes)]

    def div_vector(full):
        total = None
        for ax, d in enumerate(diffs):
            term = d(full[ax])
            total = term if total is None else total + term
        return total

    return wrap_with_bcs(grid, bcs, 2, _vectorize(div_vector, grid.dim))
