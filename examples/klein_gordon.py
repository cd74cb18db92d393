"""Klein-Gordon wave propagation (2-field predefined PDE).

Mirrors `/root/reference/examples/simple_pdes/klein_gordon.py`.
"""

import pde_tpu as pde

grid = pde.UnitGrid([48, 48], periodic=True)
u = pde.ScalarField(grid, data=0.0, label="u")
u.insert([24.0, 24.0], amount=1.0)  # initial displacement pulse
v = pde.ScalarField(grid, data=0.0, label="v")
state = pde.FieldCollection([u, v])

eq = pde.KleinGordonPDE(mass=1.0)
result = eq.solve(state, t_range=5, dt=0.01, tracker=None)
result[0].plot(title="Klein-Gordon displacement")
