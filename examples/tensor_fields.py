"""Working with rank-2 tensor fields: invariants and divergence.

Reference capability: `/root/reference/pde/fields/tensorial.py:29`.
"""

import pde_tpu as pde

grid = pde.UnitGrid([24, 24], periodic=True)
vector = pde.VectorField.from_expression(grid, ["sin(x / 4)", "cos(y / 4)"])

# velocity-gradient-like tensor and its scalar invariants
tensor = vector.gradient("periodic")
print("trace average:", float(tensor.to_scalar("trace").average))
norm = tensor.to_scalar("norm")
norm.plot(title="|∇v|")

divergence = tensor.divergence("periodic")  # rank-1 result
print("divergence magnitude:", float(divergence.to_scalar("norm").average))

sym = tensor.symmetrize()
double_div = sym.divergence("periodic").divergence("periodic")
print("double divergence average:", float(double_div.average))
