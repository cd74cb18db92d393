"""Kuramoto-Sivashinsky equation
(reference `/root/reference/pde/pdes/kuramoto_sivashinsky.py:25`)."""

from __future__ import annotations

import numpy as np

from ..fields.scalar import ScalarField
from ..grids.boundaries import set_default_bc
from .base import SDEBase, expr_prod


class KuramotoSivashinskyPDE(SDEBase):
    r"""KS equation :math:`\partial_t c = -\nu \nabla^4 c - \nabla^2 c - \frac12 (\nabla c)^2`."""

    explicit_time_dependence = False
    default_bc = "auto_periodic_neumann"

    def __init__(self, nu: float = 1, *, bc=None, bc_lap=None, noise: float = 0,
                 rng: np.random.Generator | None = None):
        super().__init__(noise=noise, rng=rng)
        self.nu = nu
        self.bc = set_default_bc(bc, self.default_bc)
        self.bc_lap = self.bc if bc_lap is None else bc_lap

    @property
    def expression(self) -> str:
        return f"-{expr_prod(self.nu, '∇⁴c')} - ∇²c - ½|∇c|²"

    def evolution_rate(self, state: ScalarField, t: float = 0) -> ScalarField:
        if not isinstance(state, ScalarField):
            raise TypeError("`state` must be ScalarField")
        state_lap = state.laplace(bc=self.bc, args={"t": t})
        result = (
            -self.nu * state_lap.laplace(bc=self.bc_lap, args={"t": t})
            - state_lap
            - 0.5 * state.gradient_squared(bc=self.bc, args={"t": t})
        )
        result.label = "evolution rate"
        return result

    def _fused_rhs(self):
        if self.bc_lap != self.bc:
            # the expression routes ONE bc to every operator; a distinct
            # bc_lap would silently integrate different boundary conditions
            # than evolution_rate
            raise NotImplementedError("Expression routing requires bc_lap == bc")
        rhs = (
            f"-{self.nu!r} * laplace(laplace(c)) - laplace(c)"
            " - 0.5 * gradient_squared(c)"
        )
        return rhs, self.bc

    def make_fused_euler_window(self, state, dt: float, mesh=None):
        """Fused Pallas Euler window via the expression stencil lowering."""
        from .base import make_fused_window_via_expression

        rhs, bc = self._fused_rhs()
        return make_fused_window_via_expression(self, state, dt, rhs,
                                                bc, mesh=mesh)

    def make_etdrk_parts(self, state, rhs_state=None):
        """Spectral linear/nonlinear split for the ETDRK4 solver."""
        from .base import make_etdrk_parts_via_expression

        rhs, bc = self._fused_rhs()
        return make_etdrk_parts_via_expression(self, state, rhs, bc, rhs_state=rhs_state)
