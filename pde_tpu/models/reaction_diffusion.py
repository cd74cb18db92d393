"""Generic reaction-diffusion systems
(reference `/root/reference/pde/pdes/reaction_diffusion.py`)."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..fields.collection import FieldCollection
from ..grids.boundaries import set_default_bc
from .base import PDEBase, expr_prod


class ReactionDiffusionPDE(PDEBase):
    r"""System of reaction-diffusion equations
    :math:`\partial_t c_i = D_i \nabla^2 c_i + f_i(c_1, ..., c_n, t)`."""

    default_bc = "auto_periodic_neumann"

    def __init__(
        self,
        variables: Sequence[str],
        diffusivity,
        sources,
        *,
        bc=None,
        bc_ops=None,
        post_step_hook=None,
    ):
        super().__init__()
        self.variables = list(variables)
        self.diffusivity = np.broadcast_to(
            np.asarray(diffusivity, dtype=float), (len(self.variables),)
        )
        if isinstance(sources, dict):
            sources = [sources.get(v, 0) for v in self.variables]
        if len(sources) != len(self.variables):
            raise ValueError("Number of sources must match number of variables")
        self.sources = list(sources)
        self.bc = set_default_bc(bc, self.default_bc)
        self.bc_ops = bc_ops or {}
        self._post_step_hook = post_step_hook

        from ..utils.expressions import ScalarExpression

        signature = [*self.variables, "t"]
        self._source_exprs = [
            ScalarExpression(src, signature=signature) for src in self.sources
        ]
        self._source_funcs = [
            expr._get_function(backend="jax") for expr in self._source_exprs
        ]

    @property
    def expressions(self) -> dict[str, str]:
        result = {}
        for var, D, src in zip(self.variables, self.diffusivity, self.sources, strict=True):
            result[var] = f"{expr_prod(float(D), f'∇²{var}')} + {src}"
        return result

    def make_post_step_hook(self, state):
        if self._post_step_hook is None:
            raise NotImplementedError
        hook = self._post_step_hook

        def post_step_hook(leaves, t, data):
            return hook(leaves, t, data)

        return post_step_hook, 0.0

    def evolution_rate(self, state: FieldCollection, t: float = 0) -> FieldCollection:
        if not isinstance(state, FieldCollection):
            raise TypeError("`state` must be FieldCollection")
        if len(state) != len(self.variables):
            raise ValueError(f"`state` must contain {len(self.variables)} fields")
        values = [f.data for f in state]
        rates = []
        for i, field in enumerate(state):
            bc = self.bc_ops.get(self.variables[i], self.bc)
            rate = self.diffusivity[i] * field.laplace(bc=bc, args={"t": t})
            source = self._source_funcs[i](*values, t)
            rates.append(rate + source)
        return FieldCollection(rates, labels=list(self.variables))
