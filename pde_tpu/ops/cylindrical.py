"""Differential operators on axially symmetric cylindrical (r, z) grids.

TPU-native re-design of `/root/reference/pde/backends/numba/operators/
cylindrical_sym.py:32-420`: vectorized 2D jnp stencils. Vector/tensor
components are ordered (r, z, φ).

Coordinate-dependent factors are precomputed on the host and resolved per
trace via :func:`~pde_tpu.grids.base.radial_factor_traced`, so decomposed
radial shards pick up their own r values inside ``shard_map`` (SPMD radial
decomposition) while staying bit-identical to serial runs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..grids.cylindrical import CylindricalSymGrid
from .common import radial_factor_traced, wrap_with_bcs

# slices for the (r, z) axes of full 2D arrays
_L, _M, _H = slice(0, -2), slice(1, -1), slice(2, None)


def _dr(full, scale):
    return (full[_H, _M] - full[_L, _M]) * scale


def _dz(full, scale):
    return (full[_M, _H] - full[_M, _L]) * scale


def _inv_r_col(grid):
    """1/r as a column vector, shard-aware (radial axis is axis 0)."""
    return radial_factor_traced(grid, lambda rs: 1 / rs)[:, None]


@CylindricalSymGrid.register_operator("laplace", rank_in=0, rank_out=0)
def make_laplace(grid: CylindricalSymGrid, bcs=None) -> Callable:
    """Cylindrical Laplacian: ∂²_r + (1/r)∂_r + ∂²_z."""
    dr, dz = grid.discretization
    dr_2, dz_2 = 1 / dr**2, 1 / dz**2

    def stencil(full):
        factor_r = radial_factor_traced(grid, lambda rs: 1 / (2 * rs * dr))[:, None]
        center = full[_M, _M]
        lap_r = (full[_H, _M] - 2 * center + full[_L, _M]) * dr_2
        lap_r = lap_r + (full[_H, _M] - full[_L, _M]) * factor_r
        lap_z = (full[_M, _L] - 2 * center + full[_M, _H]) * dz_2
        return lap_r + lap_z

    return wrap_with_bcs(grid, bcs, 0, stencil)


@CylindricalSymGrid.register_operator("gradient", rank_in=0, rank_out=1)
def make_gradient(grid: CylindricalSymGrid, bcs=None) -> Callable:
    """Cylindrical gradient: (∂_r f, ∂_z f, 0)."""
    scale_r, scale_z = 1 / (2 * grid.discretization)

    def stencil(full):
        grad_r = _dr(full, scale_r)
        grad_z = _dz(full, scale_z)
        return jnp.stack([grad_r, grad_z, jnp.zeros_like(grad_r)])

    return wrap_with_bcs(grid, bcs, 0, stencil)


@CylindricalSymGrid.register_operator("gradient_squared", rank_in=0, rank_out=0)
def make_gradient_squared(grid: CylindricalSymGrid, bcs=None, *, central: bool = True) -> Callable:
    if central:
        scale_r, scale_z = 0.25 / grid.discretization**2

        def stencil(full):
            term_r = (full[_H, _M] - full[_L, _M]) ** 2
            term_z = (full[_M, _H] - full[_M, _L]) ** 2
            return term_r * scale_r + term_z * scale_z

    else:
        scale_r, scale_z = 0.5 / grid.discretization**2

        def stencil(full):
            center = full[_M, _M]
            term_r = (full[_H, _M] - center) ** 2 + (center - full[_L, _M]) ** 2
            term_z = (full[_M, _H] - center) ** 2 + (center - full[_M, _L]) ** 2
            return term_r * scale_r + term_z * scale_z

    return wrap_with_bcs(grid, bcs, 0, stencil)


@CylindricalSymGrid.register_operator("divergence", rank_in=1, rank_out=0)
def make_divergence(grid: CylindricalSymGrid, bcs=None) -> Callable:
    """Cylindrical divergence: v_r/r + ∂_r v_r + ∂_z v_z."""
    scale_r, scale_z = 1 / (2 * grid.discretization)

    def stencil(full):
        inv_r = _inv_r_col(grid)
        v_r, v_z = full[0], full[1]
        return v_r[_M, _M] * inv_r + _dr(v_r, scale_r) + _dz(v_z, scale_z)

    return wrap_with_bcs(grid, bcs, 1, stencil)


@CylindricalSymGrid.register_operator("vector_gradient", rank_in=1, rank_out=2)
def make_vector_gradient(grid: CylindricalSymGrid, bcs=None) -> Callable:
    """Cylindrical vector gradient (3x3 tensor, components (r, z, φ))."""
    scale_r, scale_z = 1 / (2 * grid.discretization)

    def stencil(full):
        inv_r = _inv_r_col(grid)
        v_r, v_z, v_p = full[0], full[1], full[2]
        zero = jnp.zeros_like(v_r[_M, _M])
        out_rr = _dr(v_r, scale_r)
        out_rz = _dz(v_r, scale_z)
        out_rp = -v_p[_M, _M] * inv_r
        out_zr = _dr(v_z, scale_r)
        out_zz = _dz(v_z, scale_z)
        out_zp = zero
        out_pr = _dr(v_p, scale_r)
        out_pz = _dz(v_p, scale_z)
        out_pp = v_r[_M, _M] * inv_r
        return jnp.stack(
            [
                jnp.stack([out_rr, out_rz, out_rp]),
                jnp.stack([out_zr, out_zz, out_zp]),
                jnp.stack([out_pr, out_pz, out_pp]),
            ]
        )

    return wrap_with_bcs(grid, bcs, 1, stencil)


@CylindricalSymGrid.register_operator("vector_laplace", rank_in=1, rank_out=1)
def make_vector_laplace(grid: CylindricalSymGrid, bcs=None) -> Callable:
    """Cylindrical vector Laplacian with the -v/r² curvature terms."""
    dr, dz = grid.discretization
    s1, s2 = 1 / (2 * dr), 1 / dr**2
    scale_z = 1 / dz**2

    def scalar_lap(factor_r, inv_r2, comp, curvature: bool):
        center = comp[_M, _M]
        lap = (
            (comp[_M, _H] - 2 * center + comp[_M, _L]) * scale_z
            + (comp[_H, _M] - comp[_L, _M]) * factor_r
            + (comp[_H, _M] - 2 * center + comp[_L, _M]) * s2
        )
        if curvature:
            lap = lap - center * inv_r2
        return lap

    def stencil(full):
        factor_r = radial_factor_traced(grid, lambda rs: s1 / rs)[:, None]
        inv_r2 = radial_factor_traced(grid, lambda rs: 1 / rs**2)[:, None]
        v_r, v_z, v_p = full[0], full[1], full[2]
        return jnp.stack(
            [
                scalar_lap(factor_r, inv_r2, v_r, True),
                scalar_lap(factor_r, inv_r2, v_z, False),
                scalar_lap(factor_r, inv_r2, v_p, True),
            ]
        )

    return wrap_with_bcs(grid, bcs, 1, stencil)


@CylindricalSymGrid.register_operator("tensor_divergence", rank_in=2, rank_out=1)
def make_tensor_divergence(grid: CylindricalSymGrid, bcs=None) -> Callable:
    """Cylindrical tensor divergence (components (r, z, φ))."""
    scale_r, scale_z = 1 / (2 * grid.discretization)

    def stencil(full):
        inv_r = _inv_r_col(grid)
        t_rr, t_rz, t_rp = full[0, 0], full[0, 1], full[0, 2]
        t_zr, t_zz = full[1, 0], full[1, 1]
        t_pr, t_pz, t_pp = full[2, 0], full[2, 1], full[2, 2]
        out_r = (
            _dz(t_rz, scale_z)
            + _dr(t_rr, scale_r)
            + (t_rr[_M, _M] - t_pp[_M, _M]) * inv_r
        )
        out_p = (
            _dz(t_pz, scale_z)
            + _dr(t_pr, scale_r)
            + (t_rp[_M, _M] + t_pr[_M, _M]) * inv_r
        )
        out_z = _dz(t_zz, scale_z) + _dr(t_zr, scale_r) + t_zr[_M, _M] * inv_r
        return jnp.stack([out_r, out_z, out_p])

    return wrap_with_bcs(grid, bcs, 2, stencil)
