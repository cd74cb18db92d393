"""Generating random fields: uniform, normal, harmonic, and colored noise.

Mirrors `/root/reference/examples/fields/random_fields.py`.
"""

import matplotlib.pyplot as plt

import pde_tpu as pde

grid = pde.UnitGrid([64, 64], periodic=True)

fields = [
    pde.ScalarField.random_uniform(grid, label="uniform"),
    pde.ScalarField.random_normal(grid, label="normal (uncorrelated)"),
    pde.ScalarField.random_harmonic(grid, modes=4, label="harmonic"),
    pde.ScalarField.random_colored(grid, exponent=-4, label="colored noise"),
]

fig, axes = plt.subplots(2, 2, figsize=(8, 8))
for field, ax in zip(fields, axes.flat):
    field.plot(ax=ax, title=field.label)
plt.tight_layout()
