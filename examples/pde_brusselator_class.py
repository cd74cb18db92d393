"""Brusselator implemented as a custom PDE class with a hand-lowered rhs.

The same reaction-diffusion system as `pde_brusselator_expression.py`, but as a
:class:`~pde_tpu.PDEBase` subclass providing both the field-level
``evolution_rate`` and a hand-written ``make_pde_rhs`` operating on raw data
leaves (the compiled fast path the solvers consume — the TPU analogue of the
reference's numba-compiled ``make_evolution_rate``). Mirrors
`/root/reference/examples/advanced_pdes/pde_brusselator_class.py`.
"""

import pde_tpu as pde


class BrusselatorPDE(pde.PDEBase):
    """Brusselator with diffusive mobility."""

    def __init__(self, a=1, b=3, diffusivity=(1, 0.1), bc="auto_periodic_neumann"):
        super().__init__()
        self.a = a
        self.b = b
        self.diffusivity = diffusivity
        self.bc = bc

    def get_initial_state(self, grid):
        """Prepare a useful initial state."""
        u = pde.ScalarField(grid, self.a, label="Field $u$")
        v = self.b / self.a + 0.1 * pde.ScalarField.random_normal(
            grid, label="Field $v$"
        )
        return pde.FieldCollection([u, v])

    def evolution_rate(self, state, t=0):
        """Field-level implementation of the PDE (used e.g. by `scipy` solver)."""
        u, v = state
        d0, d1 = self.diffusivity
        rate_u = d0 * u.laplace(self.bc) + self.a - (self.b + 1) * u + u**2 * v
        rate_v = d1 * v.laplace(self.bc) + self.b * u - u**2 * v
        return pde.FieldCollection([rate_u, rate_v])

    def make_pde_rhs(self, state, backend="jax"):
        """Hand-lowered rhs on raw data leaves; XLA fuses the whole expression."""
        d0, d1 = self.diffusivity
        a, b = self.a, self.b
        laplace = state.grid.make_operator("laplace", bc=self.bc)

        def pde_rhs(leaves, t):
            u, v = leaves
            rate_u = d0 * laplace(u) + a - (1 + b) * u + v * u**2
            rate_v = d1 * laplace(v) + b * u - v * u**2
            return [rate_u, rate_v]

        return pde_rhs


# initialize state
grid = pde.UnitGrid([64, 64])
eq = BrusselatorPDE(diffusivity=[1, 0.1])
state = eq.get_initial_state(grid)

# simulate the pde
tracker = pde.PlotTracker(interrupts=1, plot_args={"vmin": 0, "vmax": 5})
sol = eq.solve(state, t_range=5, dt=1e-3, tracker=tracker)
sol.plot()
