"""Korteweg-de Vries equation via a custom 1D PDE class.

`∂t φ = 6 φ ∂x φ - ∂x³ φ` implemented by subclassing :class:`~pde_tpu.PDEBase`
with a field-level evolution rate built from gradient/laplace operators.
Mirrors `/root/reference/examples/advanced_pdes/pde_1d_class.py`.
"""

from math import pi

import pde_tpu as pde


class KortewegDeVriesPDE(pde.PDEBase):
    """Korteweg-de Vries equation (1D)."""

    def evolution_rate(self, state, t=0):
        assert state.grid.dim == 1  # the equation is only defined in 1D
        grad_x = state.gradient("auto_periodic_neumann")[0]
        return 6 * state * grad_x - grad_x.laplace("auto_periodic_neumann")


# initialize the equation and the space
grid = pde.CartesianGrid([[0, 2 * pi]], [32], periodic=True)
state = pde.ScalarField.from_expression(grid, "sin(x)")

# solve the equation and store the trajectory
storage = pde.MemoryStorage()
eq = KortewegDeVriesPDE()
eq.solve(state, t_range=3, solver="scipy", tracker=storage.tracker(0.1))

# plot the trajectory as a space-time plot
pde.plot_kymograph(storage)
