"""Storage format compatibility: committed resource files must stay readable.

Mirrors the reference's pre-generated storage resources
(`scripts/create_storage_test_resources.py` + storage read-back tests).
If these tests break, the on-disk format changed incompatibly.
"""

from pathlib import Path

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.storage import FileStorage

RESOURCES = Path(__file__).resolve().parents[1] / "resources"


def test_read_committed_trajectory():
    reader = FileStorage(str(RESOURCES / "trajectory_v1.h5"),
                         write_mode="read_only")
    assert len(reader) == 3
    np.testing.assert_allclose(reader.times, [0.0, 0.5, 1.0])
    field = reader[1]
    assert isinstance(field, pde.ScalarField)
    assert isinstance(field.grid, pde.CylindricalSymGrid)
    assert field.grid.shape == (8, 12)
    # frame i holds (i+1) * exp(-r²)·z
    base = pde.ScalarField.from_expression(field.grid, "exp(-r**2) * z")
    np.testing.assert_allclose(np.asarray(field.data),
                               2 * np.asarray(base.data), rtol=1e-12)
    reader.close()


def test_read_committed_field_file():
    field = pde.FieldBase.from_file(str(RESOURCES / "field_v1.h5"))
    assert isinstance(field, pde.VectorField)
    assert field.label == "flow"
    assert field.grid == pde.UnitGrid([6, 6], periodic=True)
    exact = pde.VectorField.from_expression(field.grid, ["sin(x)", "cos(y)"])
    np.testing.assert_allclose(np.asarray(field.data),
                               np.asarray(exact.data), rtol=1e-12)
