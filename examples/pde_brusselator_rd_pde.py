"""Brusselator via the :class:`~pde_tpu.ReactionDiffusionPDE` class.

`∂t u = D0 ∇²u + a - (1+b) u + u²v`, `∂t v = D1 ∇²v + b u - u²v` — reaction
terms given as expression strings, diffusivities per variable. Mirrors
`/root/reference/examples/advanced_pdes/pde_brusselator_rd_pde.py`.
"""

import pde_tpu as pde

# define the PDE
a, b = 1, 3
d0, d1 = 1, 0.1
eq = pde.ReactionDiffusionPDE(
    variables=["u", "v"],
    diffusivity=[d0, d1],
    sources=[f"{a} - ({b} + 1) * u + u**2 * v", f"{b} * u - u**2 * v"],
)

# initialize state
grid = pde.UnitGrid([64, 64])
u = pde.ScalarField(grid, a, label="Field $u$")
v = b / a + 0.1 * pde.ScalarField.random_normal(grid, label="Field $v$")
state = pde.FieldCollection([u, v])

# simulate the pde
tracker = pde.PlotTracker(interrupts=1, plot_args={"vmin": 0, "vmax": 5})
sol = eq.solve(state, t_range=5, dt=1e-3, tracker=tracker)
sol.plot()
