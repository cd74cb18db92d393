"""Diffusion with a spatially varying diffusivity in conservative form.

`∂t c = ∇·(D(x) ∇c)` with `D(x) = 1.01 + tanh(x)`; mirrors
`/root/reference/examples/simple_pdes/pde_heterogeneous_diffusion.py`.
"""

import pde_tpu as pde

grid = pde.CartesianGrid([(-5, 5)], 64)
field = pde.ScalarField(grid, data=0.0)
field.insert([0.0], amount=1.0)

eq = pde.PDE({"c": "divergence((1.01 + tanh(x)) * gradient(c))"})
result = eq.solve(field, t_range=1.0, dt=1e-3, tracker=None)
result.plot(title="heterogeneous diffusion")
