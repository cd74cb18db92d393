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
