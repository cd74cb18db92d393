"""Coordinate-system depth: all 6 systems, metric factors, round-trips.

Reference: `/root/reference/pde/grids/coordinates/` (6 systems).
"""

import numpy as np
import pytest

from pde_tpu.grids.coordinates import (
    BipolarCoordinates,
    BisphericalCoordinates,
    CartesianCoordinates,
    CylindricalCoordinates,
    DimensionError,
    PolarCoordinates,
    SphericalCoordinates,
)

SYSTEMS = [
    CartesianCoordinates(2),
    CartesianCoordinates(3),
    PolarCoordinates(),
    SphericalCoordinates(),
    CylindricalCoordinates(),
    BipolarCoordinates(),
    BisphericalCoordinates(),
]
IDS = ["cartesian2", "cartesian3", "polar", "spherical", "cylindrical",
       "bipolar", "bispherical"]


def _interior_point(c, rng):
    """A generic point safely inside the coordinate chart."""
    name = type(c).__name__
    if name.startswith("Cartesian"):
        return rng.uniform(-1, 1, c.dim)
    if name.startswith("Polar"):
        return np.array([0.5 + rng.random(), rng.uniform(0.1, 6.0)])
    if name.startswith("Spherical"):
        return np.array([0.5 + rng.random(), rng.uniform(0.2, 2.9),
                         rng.uniform(0.1, 6.0)])
    if name.startswith("Cylindrical"):
        return np.array([0.5 + rng.random(), rng.uniform(0.1, 6.0),
                         rng.uniform(-1, 1)])
    if name.startswith("Bipolar"):
        return np.array([rng.uniform(0.3, 1.0), rng.uniform(0.3, 2.8)])
    # bispherical
    return np.array([rng.uniform(0.3, 1.0), rng.uniform(0.3, 2.8),
                     rng.uniform(0.1, 6.0)])


@pytest.mark.parametrize("c", SYSTEMS, ids=IDS)
def test_pos_roundtrip(c, rng):
    p = _interior_point(c, rng)
    cart = c.pos_to_cart(p)
    back = c.pos_from_cart(cart)
    np.testing.assert_allclose(c.pos_to_cart(back), cart, atol=1e-9)


@pytest.mark.parametrize("c", SYSTEMS, ids=IDS)
def test_metric_positive(c, rng):
    p = _interior_point(c, rng)
    factors = np.asarray(c.scale_factors(p))
    assert np.all(factors > 0)


@pytest.mark.parametrize("c", SYSTEMS, ids=IDS)
def test_volume_factor_matches_jacobian(c, rng):
    """The volume factor equals the product of the scale factors."""
    p = _interior_point(c, rng)
    factors = np.asarray(c.scale_factors(p))
    vol = float(np.asarray(c.volume_factor(p)))
    assert vol == pytest.approx(float(np.prod(factors)), rel=1e-8)


@pytest.mark.parametrize("c", SYSTEMS, ids=IDS)
def test_vector_transform_preserves_norm(c, rng):
    """Orthonormal basis change preserves vector norms."""
    p = _interior_point(c, rng)
    vec = rng.random(c.dim)
    try:
        cart_vec = c.vec_to_cart(p, vec)
    except (AttributeError, NotImplementedError):
        pytest.skip("vec_to_cart not implemented for this system")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(cart_vec)),
                               np.linalg.norm(vec), rtol=1e-6)


def test_dimension_errors():
    c = PolarCoordinates()
    with pytest.raises(DimensionError):
        c.pos_to_cart(np.array([1.0, 2.0, 3.0]))


def test_scale_factors_polar_analytic():
    c = PolarCoordinates()
    p = np.array([2.0, 1.0])
    np.testing.assert_allclose(np.asarray(c.scale_factors(p)), [1.0, 2.0])


def test_scale_factors_spherical_analytic():
    c = SphericalCoordinates()
    p = np.array([2.0, np.pi / 2, 1.0])
    np.testing.assert_allclose(np.asarray(c.scale_factors(p)), [1.0, 2.0, 2.0],
                               atol=1e-12)
