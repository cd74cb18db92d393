"""Differential operators on polar (angularly symmetric 2D) grids.

TPU-native re-design of `/root/reference/pde/backends/numba/operators/
polar_sym.py:30-312`: vectorized jnp stencils over the 1D radial axis.
Vector components are ordered (r, φ).

Coordinate-dependent factors are precomputed on the host and resolved per
trace via :func:`~pde_tpu.grids.base.radial_factor_traced`, so decomposed
radial shards pick up their own r values inside ``shard_map`` (SPMD radial
decomposition) while staying bit-identical to serial runs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..grids.spherical import PolarSymGrid
from .common import radial_factor_traced, wrap_with_bcs

# slices into full 1D radial arrays
_LO, _MID, _HI = slice(0, -2), slice(1, -1), slice(2, None)


def _diff(full, method: str, scale):
    if method == "central":
        return (full[..., _HI] - full[..., _LO]) * scale
    if method == "forward":
        return (full[..., _HI] - full[..., _MID]) * (2 * scale)
    if method == "backward":
        return (full[..., _MID] - full[..., _LO]) * (2 * scale)
    raise ValueError(f"Unknown derivative method `{method}`")


@PolarSymGrid.register_operator("laplace", rank_in=0, rank_out=0)
def make_laplace(grid: PolarSymGrid, bcs=None) -> Callable:
    """Polar Laplacian: f'' + f'/r."""
    dr = grid.discretization[0]
    dr_2 = 1 / dr**2

    def stencil(full):
        factor_r = radial_factor_traced(grid, lambda rs: 1 / (2 * rs * dr))
        return (full[_HI] - 2 * full[_MID] + full[_LO]) * dr_2 + (
            full[_HI] - full[_LO]
        ) * factor_r

    return wrap_with_bcs(grid, bcs, 0, stencil)


@PolarSymGrid.register_operator("gradient", rank_in=0, rank_out=1)
def make_gradient(grid: PolarSymGrid, bcs=None, *, method: str = "central") -> Callable:
    """Polar gradient: (∂_r f, 0)."""
    scale = 0.5 / grid.discretization[0]

    def stencil(full):
        grad_r = _diff(full, method, scale)
        return jnp.stack([grad_r, jnp.zeros_like(grad_r)])

    return wrap_with_bcs(grid, bcs, 0, stencil)


@PolarSymGrid.register_operator("gradient_squared", rank_in=0, rank_out=0)
def make_gradient_squared(grid: PolarSymGrid, bcs=None, *, central: bool = True) -> Callable:
    dr = grid.discretization[0]
    if central:
        scale = 0.25 / dr**2

        def stencil(full):
            return (full[_HI] - full[_LO]) ** 2 * scale

    else:
        scale = 0.5 / dr**2

        def stencil(full):
            return (
                (full[_HI] - full[_MID]) ** 2 + (full[_MID] - full[_LO]) ** 2
            ) * scale

    return wrap_with_bcs(grid, bcs, 0, stencil)


@PolarSymGrid.register_operator("divergence", rank_in=1, rank_out=0)
def make_divergence(grid: PolarSymGrid, bcs=None) -> Callable:
    """Polar divergence: ∂_r v_r + v_r / r."""
    dr = grid.discretization[0]
    scale_r = 1 / (2 * dr)

    def stencil(full):
        inv_r = radial_factor_traced(grid, lambda rs: 1 / rs)
        v_r = full[0]
        return (v_r[_HI] - v_r[_LO]) * scale_r + v_r[_MID] * inv_r

    return wrap_with_bcs(grid, bcs, 1, stencil)


@PolarSymGrid.register_operator("vector_gradient", rank_in=1, rank_out=2)
def make_vector_gradient(grid: PolarSymGrid, bcs=None) -> Callable:
    """Polar vector gradient (2x2 tensor)."""
    dr = grid.discretization[0]
    scale_r = 1 / (2 * dr)

    def stencil(full):
        inv_r = radial_factor_traced(grid, lambda rs: 1 / rs)
        v_r, v_p = full[0], full[1]
        out_rr = (v_r[_HI] - v_r[_LO]) * scale_r
        out_rp = -v_p[_MID] * inv_r
        out_pr = (v_p[_HI] - v_p[_LO]) * scale_r
        out_pp = v_r[_MID] * inv_r
        return jnp.stack(
            [jnp.stack([out_rr, out_rp]), jnp.stack([out_pr, out_pp])]
        )

    return wrap_with_bcs(grid, bcs, 1, stencil)


@PolarSymGrid.register_operator("tensor_divergence", rank_in=2, rank_out=1)
def make_tensor_divergence(grid: PolarSymGrid, bcs=None) -> Callable:
    """Polar tensor divergence."""
    dr = grid.discretization[0]
    scale_r = 1 / (2 * dr)

    def stencil(full):
        inv_r = radial_factor_traced(grid, lambda rs: 1 / rs)
        t_rr, t_rp = full[0, 0], full[0, 1]
        t_pr, t_pp = full[1, 0], full[1, 1]
        out_r = (t_rr[_HI] - t_rr[_LO]) * scale_r + (
            t_rr[_MID] - t_pp[_MID]
        ) * inv_r
        out_p = (t_pr[_HI] - t_pr[_LO]) * scale_r + (
            t_rp[_MID] + t_pr[_MID]
        ) * inv_r
        return jnp.stack([out_r, out_p])

    return wrap_with_bcs(grid, bcs, 2, stencil)
