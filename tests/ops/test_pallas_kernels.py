"""Pallas kernel correctness in interpreter mode (runs on CPU).

The real-TPU performance path is exercised by bench.py; these tests validate
the kernel math against the jnp lowering using pallas interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.ops.pallas_cartesian import (
    PallasUnsupportedError,
    _pick_band,
    make_affine_laplace_2d,
    supports_affine_laplace,
)


def test_supports_checks():
    grid = pde.UnitGrid([64, 128], periodic=True)
    # CPU backend → unsupported for compiled mode
    assert not supports_affine_laplace(grid, np.float32)
    with pytest.raises(PallasUnsupportedError):
        make_affine_laplace_2d(grid, a=1.0, b=0.01)
    # non-periodic grids are never supported
    assert not supports_affine_laplace(pde.UnitGrid([64, 128]), np.float32)
    # float64 unsupported
    assert not supports_affine_laplace(grid, np.float64)


def test_pick_band():
    assert _pick_band(4096, 4096, 4, 8) in (64, 128)
    assert 4096 % _pick_band(4096, 4096, 4, 8) == 0
    assert _pick_band(64, 128, 4, 1) <= 64


@pytest.mark.parametrize("k", [1, 4, 8])
def test_affine_laplace_interpret(k, rng):
    """Kernel math matches the jnp operator (interpret mode, CPU)."""
    grid = pde.UnitGrid([32, 128], periodic=True)
    data = jnp.asarray(rng.random((32, 128)), dtype=jnp.float32)
    a, b = 1.0, 0.01
    kernel = make_affine_laplace_2d(grid, a=a, b=b, k=k, dtype=jnp.float32,
                                    interpret=True)
    out = kernel(data)

    lap = grid.make_operator("laplace", bc="periodic")
    ref = data
    for _ in range(k):
        ref = a * ref + b * jnp.asarray(lap(ref), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_affine_laplace_anisotropic_interpret(rng):
    grid = pde.CartesianGrid([(0, 1), (0, 4)], (32, 128), periodic=True)
    data = jnp.asarray(rng.random((32, 128)), dtype=jnp.float32)
    kernel = make_affine_laplace_2d(grid, a=0.0, b=1.0, k=1, dtype=jnp.float32,
                                    interpret=True)
    out = kernel(data)
    lap = grid.make_operator("laplace", bc="periodic")
    ref = jnp.asarray(lap(data), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
