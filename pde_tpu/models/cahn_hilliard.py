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
