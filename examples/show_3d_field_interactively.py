"""Visualize a 3D scalar field interactively with napari.

Mirrors `/root/reference/examples/fields/show_3d_field_interactively.py`.
napari is optional; without it the example falls back to plotting an
interpolated 2D slice of the same field.
"""

import pde_tpu as pde
from pde_tpu.trackers.interactive import napari_available

grid = pde.UnitGrid([32, 32, 32], periodic=True)
field = pde.ScalarField.random_colored(grid, exponent=-4, label="random field")
field = field.smooth(1)

if napari_available():
    field.plot_interactive()
else:
    print("napari not installed - plotting a 2D slice instead")
    field.slice({"z": 16}).plot(title="z = 16 slice of the 3D field")
