"""Spatial SIR epidemic model as a coupled expression PDE (3 fields).

Mirrors `/root/reference/examples/advanced_pdes/pde_sir.py`.
"""

import pde_tpu as pde

beta, gamma, D = 2.0, 0.4, 0.1
eq = pde.PDE(
    {
        "s": f"{D} * laplace(s) - {beta} * i * s",
        "i": f"{D} * laplace(i) + {beta} * i * s - {gamma} * i",
        "r": f"{gamma} * i",
    }
)

grid = pde.UnitGrid([24, 24])
s = pde.ScalarField(grid, data=1.0, label="susceptible")
i = pde.ScalarField(grid, data=0.0, label="infected")
i.insert([12.0, 12.0], amount=5.0)  # seed an outbreak in the center
r = pde.ScalarField(grid, data=0.0, label="recovered")
state = pde.FieldCollection([s, i, r])

result = eq.solve(state, t_range=3, dt=0.01, tracker=None)
result.plot(title="SIR at t=3")
