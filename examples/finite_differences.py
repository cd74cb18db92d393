"""Finite-difference operators applied interactively to fields.

Mirrors `/root/reference/examples/fields/finite_differences.py` — comparing
the discrete Laplacian with the analytic one.
"""

import numpy as np

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 2 * np.pi)], 128, periodic=True)
field = pde.ScalarField.from_expression(grid, "sin(x)")

laplace = field.laplace("periodic")
exact = pde.ScalarField.from_expression(grid, "-sin(x)")
error = float(np.max(np.abs(laplace.data - exact.data)))
print(f"max |∇²sin - (-sin)| = {error:.2e}")

# generic operator application by name
lap2 = field.apply_operator("laplace", bc="periodic")
assert np.allclose(np.asarray(lap2.data), np.asarray(laplace.data))
