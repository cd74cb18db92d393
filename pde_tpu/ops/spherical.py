"""Differential operators on spherically symmetric (3D) grids.

TPU-native re-design of `/root/reference/pde/backends/numba/operators/
spherical_sym.py:33-680`: conservative flux-form stencils (r²-weighted shell
volumes ensure exact mass conservation) with naive variants, vectorized over
the 1D radial axis. Vector components are ordered (r, θ, φ).

Coordinate-dependent factors are precomputed on the host (numpy) and resolved
per trace via :func:`~pde_tpu.grids.base.radial_factor_traced`, so decomposed
radial shards pick up their own r values inside ``shard_map`` (SPMD radial
decomposition) while staying bit-identical to serial runs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..grids.spherical import SphericalSymGrid
from ..utils.config import config
from .common import radial_factor_traced, wrap_with_bcs

_LO, _MID, _HI = slice(0, -2), slice(1, -1), slice(2, None)


def _shell_parts(rs, dr):
    """Inner/outer shell radii and volumes for cell-centered radii (numpy)."""
    rl = rs - dr / 2
    rh = rs + dr / 2
    volumes = (rh**3 - rl**3) / 3
    return rl, rh, volumes


@SphericalSymGrid.register_operator("laplace", rank_in=0, rank_out=0)
def make_laplace(grid: SphericalSymGrid, bcs=None, *, conservative=None) -> Callable:
    """Spherical Laplacian; conservative (flux-form) by default."""
    if conservative is None:
        conservative = config["operators.conservative_stencil"]
    dr = grid.discretization[0]

    if conservative:

        def factor_l(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rl**2 / (dr * volumes)

        def factor_h(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rh**2 / (dr * volumes)

        def stencil(full):
            f_l = radial_factor_traced(grid, factor_l)
            f_h = radial_factor_traced(grid, factor_h)
            term_h = f_h * (full[_HI] - full[_MID])
            term_l = f_l * (full[_MID] - full[_LO])
            return term_h - term_l

    else:
        dr2 = 1 / dr**2

        def stencil(full):
            inv_rdr = radial_factor_traced(grid, lambda rs: 1 / (rs * dr))
            diff_2 = (full[_HI] - 2 * full[_MID] + full[_LO]) * dr2
            diff_1 = (full[_HI] - full[_LO]) * inv_rdr
            return diff_2 + diff_1

    return wrap_with_bcs(grid, bcs, 0, stencil)


@SphericalSymGrid.register_operator("gradient", rank_in=0, rank_out=1)
def make_gradient(grid: SphericalSymGrid, bcs=None, *, method: str = "central") -> Callable:
    """Spherical gradient: (∂_r f, 0, 0)."""
    dr = grid.discretization[0]

    def stencil(full):
        if method == "central":
            grad_r = (full[_HI] - full[_LO]) * (0.5 / dr)
        elif method == "forward":
            grad_r = (full[_HI] - full[_MID]) / dr
        elif method == "backward":
            grad_r = (full[_MID] - full[_LO]) / dr
        else:
            raise ValueError(f"Unknown derivative method `{method}`")
        zero = jnp.zeros_like(grad_r)
        return jnp.stack([grad_r, zero, zero])

    return wrap_with_bcs(grid, bcs, 0, stencil)


@SphericalSymGrid.register_operator("gradient_squared", rank_in=0, rank_out=0)
def make_gradient_squared(grid: SphericalSymGrid, bcs=None, *, central: bool = True) -> Callable:
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


@SphericalSymGrid.register_operator("divergence", rank_in=1, rank_out=0)
def make_divergence(
    grid: SphericalSymGrid, bcs=None, *, safe=None, conservative=None,
    method: str = "central",
) -> Callable:
    """Spherical divergence of the radial component: ∂_r v_r + 2 v_r / r.

    The θ/φ components are ignored (they cannot contribute to an angularly
    symmetric scalar field); reference `spherical_sym.py` divergence.
    """
    if conservative is None:
        conservative = config["operators.conservative_stencil"]
    dr = grid.discretization[0]

    if conservative:

        def factor_l(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rl**2 / (2 * volumes)

        def factor_h(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rh**2 / (2 * volumes)

        def stencil(full):
            f_l = radial_factor_traced(grid, factor_l)
            f_h = radial_factor_traced(grid, factor_h)
            v_r = full[0]
            if method == "central":
                term_h = f_h * (v_r[_MID] + v_r[_HI])
                term_l = f_l * (v_r[_LO] + v_r[_MID])
            elif method == "forward":
                term_h = 2 * f_h * v_r[_HI]
                term_l = 2 * f_l * v_r[_MID]
            elif method == "backward":
                term_h = 2 * f_h * v_r[_MID]
                term_l = 2 * f_l * v_r[_LO]
            else:
                raise ValueError(f"Unknown derivative method `{method}`")
            return term_h - term_l

    else:

        def stencil(full):
            inv_r2 = radial_factor_traced(grid, lambda rs: 2 / rs)
            v_r = full[0]
            if method == "central":
                diff_r = (v_r[_HI] - v_r[_LO]) / (2 * dr)
            elif method == "forward":
                diff_r = (v_r[_HI] - v_r[_MID]) / dr
            elif method == "backward":
                diff_r = (v_r[_MID] - v_r[_LO]) / dr
            else:
                raise ValueError(f"Unknown derivative method `{method}`")
            return diff_r + v_r[_MID] * inv_r2

    return wrap_with_bcs(grid, bcs, 1, stencil)


@SphericalSymGrid.register_operator("vector_gradient", rank_in=1, rank_out=2)
def make_vector_gradient(
    grid: SphericalSymGrid, bcs=None, *, safe=None, method: str = "central"
) -> Callable:
    """Spherical vector gradient (3x3 tensor; only rr, θθ, φφ nonzero)."""
    dr = grid.discretization[0]

    def stencil(full):
        inv_r = radial_factor_traced(grid, lambda rs: 1 / rs)
        v_r = full[0]
        if method == "central":
            out_rr = (v_r[_HI] - v_r[_LO]) * (0.5 / dr)
        elif method == "forward":
            out_rr = (v_r[_HI] - v_r[_MID]) / dr
        elif method == "backward":
            out_rr = (v_r[_MID] - v_r[_LO]) / dr
        else:
            raise ValueError(f"Unknown derivative method `{method}`")
        diag = v_r[_MID] * inv_r
        zero = jnp.zeros_like(out_rr)
        return jnp.stack(
            [
                jnp.stack([out_rr, zero, zero]),
                jnp.stack([zero, diag, zero]),
                jnp.stack([zero, zero, diag]),
            ]
        )

    return wrap_with_bcs(grid, bcs, 1, stencil)


@SphericalSymGrid.register_operator("tensor_divergence", rank_in=2, rank_out=1)
def make_tensor_divergence(
    grid: SphericalSymGrid, bcs=None, *, safe=None, conservative=None
) -> Callable:
    """Spherical tensor divergence."""
    if conservative is None:
        conservative = config["operators.conservative_stencil"]
    dr = grid.discretization[0]

    if conservative:

        def factor_l(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rl**2 / (2 * volumes)

        def factor_h(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rh**2 / (2 * volumes)

        def factor_area(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return (rh**2 - rl**2) / volumes

        def stencil(full):
            f_l = radial_factor_traced(grid, factor_l)
            f_h = radial_factor_traced(grid, factor_h)
            f_area = radial_factor_traced(grid, factor_area)
            t_rr = full[0, 0]
            t_pp = full[2, 2]
            term_h = f_h * (t_rr[_MID] + t_rr[_HI])
            term_l = f_l * (t_rr[_LO] + t_rr[_MID])
            out_r = term_h - term_l - f_area * t_pp[_MID]
            zero = jnp.zeros_like(out_r)
            return jnp.stack([out_r, zero, zero])

    else:
        scale_r = 1 / (2 * dr)

        def stencil(full):
            inv_r2 = radial_factor_traced(grid, lambda rs: 2 / rs)
            inv_r = radial_factor_traced(grid, lambda rs: 1 / rs)
            t_rr, t_rp = full[0, 0], full[0, 2]
            t_tr = full[1, 0]
            t_pr, t_pp = full[2, 0], full[2, 2]
            out_r = (t_rr[_HI] - t_rr[_LO]) * scale_r + (
                t_rr[_MID] - t_pp[_MID]
            ) * inv_r2
            out_t = (t_tr[_HI] - t_tr[_LO]) * scale_r + t_tr[_MID] * inv_r2
            out_p = (t_pr[_HI] - t_pr[_LO]) * scale_r + (
                2 * t_pr[_MID] + t_rp[_MID]
            ) * inv_r
            return jnp.stack([out_r, out_t, out_p])

    return wrap_with_bcs(grid, bcs, 2, stencil)


@SphericalSymGrid.register_operator("tensor_double_divergence", rank_in=2, rank_out=0)
def make_tensor_double_divergence(
    grid: SphericalSymGrid, bcs=None, *, safe=None, conservative=None
) -> Callable:
    """Spherical tensor double divergence ∇·(∇·T)."""
    if conservative is None:
        conservative = config["operators.conservative_stencil"]
    dr = grid.discretization[0]

    if conservative:

        def factor_l(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rl / volumes

        def factor_h(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rh / volumes

        def factor2_l(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rl**2 / (dr * volumes)

        def factor2_h(rs):
            rl, rh, volumes = _shell_parts(rs, dr)
            return rh**2 / (dr * volumes)

        def stencil(full):
            f_l = radial_factor_traced(grid, factor_l)
            f_h = radial_factor_traced(grid, factor_h)
            f2_l = radial_factor_traced(grid, factor2_l)
            f2_h = radial_factor_traced(grid, factor2_h)
            t_rr = full[0, 0]
            t_pp = full[2, 2]
            rr_h = t_rr[_MID] + t_rr[_HI]
            rr_l = t_rr[_LO] + t_rr[_MID]
            rr_dr_h = t_rr[_HI] - t_rr[_MID]
            rr_dr_l = t_rr[_MID] - t_rr[_LO]
            div2_rr = (f_h * rr_h + f2_h * rr_dr_h) - (
                f_l * rr_l + f2_l * rr_dr_l
            )
            pp_h = t_pp[_MID] + t_pp[_HI]
            pp_l = t_pp[_LO] + t_pp[_MID]
            div2_pp = f_h * pp_h - f_l * pp_l
            return div2_rr - div2_pp

    else:
        dr2 = 1 / dr**2
        scale_r = 1 / (2 * dr)

        def stencil(full):
            inv_rdr = radial_factor_traced(grid, lambda rs: 1 / (rs * dr))
            inv_r = radial_factor_traced(grid, lambda rs: 1 / rs)
            inv_r2 = radial_factor_traced(grid, lambda rs: 2 / rs)
            t_rr = full[0, 0]
            t_pp = full[2, 2]
            rr_dr = (t_rr[_HI] - t_rr[_LO]) * scale_r
            pp_dr = (t_pp[_HI] - t_pp[_LO]) * scale_r
            lap_rr = (t_rr[_HI] - t_rr[_LO]) * inv_rdr + (
                t_rr[_HI] - 2 * t_rr[_MID] + t_rr[_LO]
            ) * dr2
            enum = (t_rr[_MID] - t_pp[_MID]) * inv_r + rr_dr - pp_dr
            return lap_rr + enum * inv_r2

    return wrap_with_bcs(grid, bcs, 2, stencil)
