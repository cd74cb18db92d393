"""Brusselator reaction-diffusion system as a coupled expression PDE.

Mirrors `/root/reference/examples/advanced_pdes/pde_brusselator_expression.py`.
"""

import pde_tpu as pde

a, b = 1, 3
d0, d1 = 1, 0.1
eq = pde.PDE(
    {
        "u": f"{d0} * laplace(u) + {a} - ({b} + 1) * u + u**2 * v",
        "v": f"{d1} * laplace(v) + {b} * u - u**2 * v",
    }
)

grid = pde.UnitGrid([128, 128])  # lane-aligned so the fused TPU kernel engages
u = pde.ScalarField(grid, a, label="u")
v = b / a + 0.1 * pde.ScalarField.random_normal(grid, label="v")
state = pde.FieldCollection([u, v])

sol, info = eq.solve(state, t_range=5, dt=1e-3, ret_info=True)
# on TPU the coupled system runs as one fused Pallas window (several Euler
# steps per HBM pass); elsewhere the XLA lowering is used
print("fused kernel:", info["solver"].get("fused_step", False))
sol.plot(title="Brusselator")
