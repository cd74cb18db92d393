"""Fields on a cylindrical grid.

Mirrors `/root/reference/examples/fields/plot_cylindrical_field.py`.
"""

import pde_tpu as pde

grid = pde.CylindricalSymGrid(radius=3, bounds_z=(0, 4), shape=(16, 24))
field = pde.ScalarField.from_expression(grid, "sqrt(z) * exp(-r**2)")
field.plot(title="cylindrical field")
print("integral:", float(field.integral))
