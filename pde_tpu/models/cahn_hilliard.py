"""Cahn-Hilliard equation (reference `/root/reference/pde/pdes/cahn_hilliard.py:23`)."""

from __future__ import annotations

from ..fields.scalar import ScalarField
from ..grids.boundaries import set_default_bc
from .base import PDEBase, expr_prod


class CahnHilliardPDE(PDEBase):
    r"""Cahn-Hilliard equation :math:`\partial_t c = \nabla^2(c^3 - c - \gamma\nabla^2 c)`."""

    explicit_time_dependence = False
    default_bc_c = "auto_periodic_neumann"
    default_bc_mu = "auto_periodic_neumann"

    def __init__(self, interface_width: float = 1, *, bc_c=None, bc_mu=None):
        super().__init__()
        self.interface_width = interface_width
        self.bc_c = set_default_bc(bc_c, self.default_bc_c)
        self.bc_mu = set_default_bc(bc_mu, self.default_bc_mu)

    @property
    def expression(self) -> str:
        return f"∇²(c³ - c - {expr_prod(self.interface_width, '∇²c')})"

    def evolution_rate(self, state: ScalarField, t: float = 0) -> ScalarField:
        if not isinstance(state, ScalarField):
            raise TypeError("`state` must be ScalarField")
        c_laplace = state.laplace(bc=self.bc_c, label="evolution rate", args={"t": t})
        mu = state**3 - state - self.interface_width * c_laplace
        return mu.laplace(bc=self.bc_mu, args={"t": t})

    def _fused_rhs(self):
        if self.bc_c != self.bc_mu:
            # the expression routing cannot distinguish the inner from the
            # outer laplace
            raise NotImplementedError(
                "Expression routing requires bc_c == bc_mu"
            )
        gamma = float(self.interface_width)
        return f"laplace(c**3 - c - {gamma!r} * laplace(c))", self.bc_c

    def make_fused_euler_window(self, state: ScalarField, dt: float, mesh=None):
        """Temporally-blocked Euler window: the full Cahn-Hilliard step
        (two Laplacians + the cubic chemical potential) runs in VMEM, 4 steps
        per HBM pass. Raises NotImplementedError when unsupported."""
        from ..grids.boundaries.axes import BoundariesList
        from ..ops.pallas_cartesian import (
            PallasUnsupportedError,
            _require_default_laplace_stencil,
            affine_bc_params,
            interpret_requested,
            make_chunked_window_2d,
        )

        try:
            # ops.lap lowers the 5-point stencil only: a configured 9-point
            # corner weight must fall back to XLA (which honors it) instead
            # of silently integrating the wrong stencil
            _require_default_laplace_stencil()
        except PallasUnsupportedError as err:
            raise NotImplementedError(str(err)) from err

        if mesh is not None:
            # decomposed: route through the expression compiler (requires
            # identical BCs for both Laplacians — the per-op routing cannot
            # distinguish the inner from the outer laplace)
            if self.bc_c != self.bc_mu:
                raise NotImplementedError(
                    "Sharded fused Cahn-Hilliard requires bc_c == bc_mu"
                )
            from .base import make_fused_window_via_expression

            gamma = float(self.interface_width)
            rhs = f"laplace(c**3 - c - {gamma!r} * laplace(c))"
            return make_fused_window_via_expression(
                self, state, dt, rhs, self.bc_c, mesh=mesh
            )

        params = []
        for bc in (self.bc_c, self.bc_mu):
            bcs = state.grid.get_boundary_conditions(bc)
            if not isinstance(bcs, BoundariesList):
                raise NotImplementedError("Fused window requires per-axis BCs")
            try:
                params.append(affine_bc_params(state.grid, bcs))
            except PallasUnsupportedError as err:
                raise NotImplementedError(str(err)) from err
        bc_c_params, bc_mu_params = params
        gamma = float(self.interface_width)

        def make_step(ops):
            def step(work):
                lap_c = ops.lap(work, bc=bc_c_params)
                c = work[1:-1, :]
                mu = c * c * c - c - gamma * lap_c
                return work[2:-2, :] + dt * ops.lap(mu, bc=bc_mu_params)

            return step

        try:
            return make_chunked_window_2d(
                state.grid, make_step, 2, dtype=state.dtype,
                interpret=interpret_requested(),
            )
        except PallasUnsupportedError as err:
            raise NotImplementedError(str(err)) from err

    def make_etdrk_parts(self, state, rhs_state=None):
        """Spectral linear/nonlinear split for the ETDRK4 solver."""
        from .base import make_etdrk_parts_via_expression

        if self.bc_c != self.bc_mu:
            raise NotImplementedError("ETDRK split requires bc_c == bc_mu")
        gamma = float(self.interface_width)
        rhs = f"laplace(c**3 - c - {gamma!r} * laplace(c))"
        return make_etdrk_parts_via_expression(self, state, rhs, self.bc_c, rhs_state=rhs_state)
