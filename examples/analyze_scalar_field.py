"""Analyzing a scalar field: integrals, interpolation, gradients, smoothing.

Mirrors `/root/reference/examples/fields/analyze_scalar_field.py`.
"""

import numpy as np

import pde_tpu as pde

grid = pde.CartesianGrid([(0, 2 * np.pi)] * 2, 48, periodic=True)
field = pde.ScalarField.from_expression(grid, "sin(x) * cos(2 * y)")

print("average:", float(field.average))
print("fluctuations:", float(field.fluctuations))
print("magnitude:", float(field.magnitude))

# interpolate at arbitrary points
value = field.interpolate([[np.pi / 2, 0.0]])
print("value at (π/2, 0):", float(np.asarray(value).ravel()[0]))

gradient = field.gradient("periodic")
print("gradient norm average:", float(gradient.to_scalar("norm").average))

smoothed = field.smooth(sigma=1.0)
smoothed.plot(title="smoothed field")
