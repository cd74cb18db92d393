"""Defining a custom PDE class with an explicit evolution rate.

The Fisher-KPP equation `∂t u = u(1-u) + ∇²u` implemented by subclassing
:class:`~pde_tpu.PDEBase`. Mirrors the intent of
`/root/reference/examples/advanced_pdes/pde_custom_class.py`.
"""

import pde_tpu as pde


class FisherKPP(pde.PDEBase):
    """Fisher-KPP (logistic growth + diffusion)."""

    def __init__(self, growth_rate: float = 1.0, bc="auto_periodic_neumann"):
        super().__init__()
        self.growth_rate = growth_rate
        self.bc = bc

    def evolution_rate(self, state, t=0):
        return self.growth_rate * state * (1 - state) + state.laplace(self.bc)


grid = pde.UnitGrid([32, 32])
state = pde.ScalarField.random_uniform(grid, 0.0, 0.2)
eq = FisherKPP(growth_rate=2.0)
result = eq.solve(state, t_range=2, dt=0.01, tracker=None)
result.plot(title="Fisher-KPP at t=2")
