"""Kuramoto-Sivashinsky via a custom class with a hand-compiled rhs.

The reference accelerates custom classes with a numba-compiled method
(`/root/reference/examples/advanced_pdes/pde_custom_numba.py`); the TPU
analogue overrides ``make_pde_rhs`` with a closure over pre-built grid
operators — XLA compiles and fuses the whole right-hand side into the device
time loop.

.. math:: ∂t u = -|∇u|²/2 - ∇²u - ∇⁴u
"""

import pde_tpu as pde


class KuramotoSivashinskyPDE(pde.PDEBase):
    """Normalized Kuramoto–Sivashinsky equation."""

    def __init__(self, bc="auto_periodic_neumann"):
        super().__init__()
        self.bc = bc

    def evolution_rate(self, state, t=0):
        """Field-level version of the evolution equation."""
        state_lap = state.laplace(bc=self.bc)
        state_lap2 = state_lap.laplace(bc=self.bc)
        state_grad_sq = state.gradient_squared(bc=self.bc)
        return -state_grad_sq / 2 - state_lap - state_lap2

    def make_pde_rhs(self, state, backend="jax"):
        """Hand-lowered rhs on raw data (compiled into the solver loop)."""
        laplace = state.grid.make_operator("laplace", bc=self.bc)
        gradient_squared = state.grid.make_operator("gradient_squared", bc=self.bc)

        def pde_rhs(leaves, t):
            (u,) = leaves
            lap = laplace(u)
            return [-gradient_squared(u) / 2 - lap - laplace(lap)]

        return pde_rhs


grid = pde.UnitGrid([32, 32])
state = pde.ScalarField.random_uniform(grid)

eq = KuramotoSivashinskyPDE()
eq.check_rhs_consistency(state)  # hand-lowered rhs must match evolution_rate
result = eq.solve(state, t_range=10, dt=0.01, tracker=None)
result.plot(title="Kuramoto-Sivashinsky at t=10")
