"""Simple diffusion equation (reference `/root/reference/pde/pdes/diffusion.py:25`)."""

from __future__ import annotations

import numpy as np

from ..fields.scalar import ScalarField
from ..grids.boundaries import set_default_bc
from .base import SDEBase, expr_prod


class DiffusionPDE(SDEBase):
    r"""Diffusion equation :math:`\partial_t c = D \nabla^2 c` (+ optional noise)."""

    explicit_time_dependence = False
    default_bc = "auto_periodic_neumann"

    def __init__(self, diffusivity: float = 1, *, bc=None, noise: float = 0,
                 rng: np.random.Generator | None = None):
        super().__init__(noise=noise, rng=rng)
        self.diffusivity = diffusivity
        self.bc = set_default_bc(bc, self.default_bc)

    @property
    def expression(self) -> str:
        return expr_prod(self.diffusivity, "∇²(c)")

    def evolution_rate(self, state: ScalarField, t: float = 0) -> ScalarField:
        if not isinstance(state, ScalarField):
            raise TypeError("`state` must be ScalarField")
        return self.diffusivity * state.laplace(
            bc=self.bc, label="evolution rate", args={"t": t}
        )

    def _fused_rhs(self):
        return f"{self.diffusivity!r} * laplace(c)", self.bc

    def make_fused_euler_window(self, state: ScalarField, dt: float, mesh=None):
        """Temporally-blocked Euler window (8 steps per HBM pass, Pallas).

        Returns ``window(data, steps) -> data``. With ``mesh`` given, the
        window operates on one shard and must run inside ``shard_map`` over
        ``mesh.jax_mesh`` (halos exchanged via ppermute once per kernel call).
        Raises NotImplementedError when unsupported, in which case solvers use
        the generic XLA lowering.
        """
        from ..grids.boundaries.axes import BoundariesList
        from ..ops.pallas_cartesian import (
            PallasUnsupportedError,
            interpret_requested,
            make_fused_euler_window_2d,
        )

        if self.is_sde:
            # stochastic diffusion fuses as an Euler-Maruyama window via the
            # expression compiler (same route as KPZ/Allen-Cahn)
            from .base import make_fused_window_via_expression

            return make_fused_window_via_expression(
                self, state, dt, f"{self.diffusivity!r} * laplace(c)",
                self.bc, mesh=mesh,
            )
        bcs = state.grid.get_boundary_conditions(self.bc)
        if not isinstance(bcs, BoundariesList):
            raise NotImplementedError("Fused window requires per-axis BCs")
        fully_periodic = all(b.periodic for b in bcs)
        try:
            if mesh is not None:
                from ..parallel.fused import make_fused_euler_window_sharded

                return make_fused_euler_window_sharded(
                    mesh, diffusivity=self.diffusivity, dt=dt,
                    dtype=state.dtype, bcs=None if fully_periodic else bcs,
                    interpret=interpret_requested(),
                )
            if state.grid.num_axes == 3:
                from ..ops.pallas_cartesian import make_fused_euler_window_3d

                return make_fused_euler_window_3d(
                    state.grid, diffusivity=self.diffusivity, dt=dt,
                    dtype=state.dtype, bcs=None if fully_periodic else bcs,
                    interpret=interpret_requested(),
                )
            # 2D handles Cartesian AND cylindrical grids (per-row radial
            # coefficients); cylindrical grids always pass explicit bcs
            return make_fused_euler_window_2d(
                state.grid, diffusivity=self.diffusivity, dt=dt,
                dtype=state.dtype, bcs=None if fully_periodic else bcs,
                interpret=interpret_requested(),
            )
        except PallasUnsupportedError as err:
            # one spec parse feeds every reroute predicate (affine_bc_specs
            # runs sympy differentiation per expression side)
            from ..ops.pallas_cartesian import (
                _specs_have_array_factors,
                _specs_have_t_factors,
                _specs_have_xt,
                affine_bc_specs,
            )

            try:
                specs = affine_bc_specs(state.grid, bcs)
            except PallasUnsupportedError:
                specs = None
            reroute = (
                # sin(x - t)-style BC values, array-valued factors, and
                # t-dependent ghost coefficients (mixed gamma varying in t):
                # only the expression-compiled stencil kernels stage them
                # (sharded runs included for xt; the sharded windows gate
                # factors and fall back from the rerouted path cleanly)
                state.grid.num_axes == 2
                and (
                    _specs_have_xt(specs)
                    or _specs_have_array_factors(specs)
                    or _specs_have_t_factors(specs)
                )
            ) or (
                # 3D array/t-dependent BC values: the specialized affine 3D
                # kernels take scalar consts; the expression-compiled 3D
                # windows stage per-face planes/blocks + SMEM t tables,
                # single-device AND decomposed
                state.grid.num_axes == 3
                and specs is not None
                and any(
                    not side.is_scalar
                    for pair in specs
                    if pair is not None
                    for side in pair
                )
            )
            if reroute:
                from .base import make_fused_window_via_expression

                return make_fused_window_via_expression(
                    self, state, dt, f"{self.diffusivity!r} * laplace(c)",
                    self.bc, mesh=mesh,
                )
            raise NotImplementedError(str(err)) from err

    def make_etdrk_parts(self, state, rhs_state=None):
        """Spectral linear/nonlinear split for the ETDRK4 solver."""
        from .base import make_etdrk_parts_via_expression

        rhs = f"{self.diffusivity!r} * laplace(c)"
        return make_etdrk_parts_via_expression(self, state, rhs, self.bc, rhs_state=rhs_state)
