"""Coupled FitzHugh-Nagumo-style system with a FieldCollection state.

Mirrors `/root/reference/examples/advanced_pdes/pde_coupled.py`.
"""

import pde_tpu as pde

eq = pde.PDE(
    {
        "v": "laplace(v) + v - v**3 / 3 - w",
        "w": "0.05 * (v + 0.5 - 0.8 * w)",
    }
)

grid = pde.UnitGrid([24, 24], periodic=True)
v = pde.ScalarField.random_normal(grid, label="v")
w = pde.ScalarField(grid, data=0.0, label="w")
state = pde.FieldCollection([v, w])

result = eq.solve(state, t_range=2, dt=0.01, tracker=None)
result.plot(title="FitzHugh-Nagumo")
