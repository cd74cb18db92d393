"""Plotting vector fields (quiver and streamplot styles).

Mirrors `/root/reference/examples/fields/plot_vector_field.py`.
"""

import pde_tpu as pde

grid = pde.UnitGrid([24, 24])
field = pde.VectorField.from_expression(grid, ["sin(x / 4)", "cos(y / 4)"])
field.plot(method="quiver", title="vector field (quiver)")
field.to_scalar("norm").plot(title="vector magnitude")
