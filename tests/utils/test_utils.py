"""Tests for utility modules (expressions, config, math, spectral)."""

import numpy as np
import pytest

from pde_tpu.utils.config import Config, Parameter, config, environment
from pde_tpu.utils.expressions import ScalarExpression, TensorExpression
from pde_tpu.utils.math import OnlineStatistics, SmoothData1D
from pde_tpu.utils.parse_duration import parse_duration
from pde_tpu.utils.spectral import make_correlated_noise


def test_scalar_expression():
    expr = ScalarExpression("x**2 + sin(y)", signature=["x", "y"])
    assert expr(2.0, 0.0) == pytest.approx(4.0)
    assert expr.depends_on == {"x", "y"}
    assert not expr.constant
    d = expr.differentiate("x")
    assert d(3.0, 0.0) == pytest.approx(6.0)
    # jax lowering
    fn = expr._get_function(backend="jax")
    assert float(fn(2.0, np.pi / 2)) == pytest.approx(5.0)
    # constants
    c = ScalarExpression("3.5")
    assert c.constant and c.value == 3.5 and not c.is_zero
    assert ScalarExpression(0).is_zero


def test_expression_consts_and_user_funcs():
    expr = ScalarExpression("a * f(x)", signature=["x"], consts={"a": 2.0},
                            user_funcs={"f": lambda x: x + 1})
    assert expr(3.0) == pytest.approx(8.0)


def test_expression_guarding():
    with pytest.raises(ValueError):
        ScalarExpression("__import__('os').system('ls')")
    with pytest.raises(RuntimeError):
        ScalarExpression("x + q", signature=["x"])  # undefined variable


def test_tensor_expression():
    expr = TensorExpression([["x", "2*x"], ["0", "1"]], signature=["x"])
    assert expr.shape == (2, 2)
    assert expr.rank == 2
    fn = expr._get_function(backend="numpy")
    result = fn(3.0)
    np.testing.assert_allclose(result, [[3.0, 6.0], [0.0, 1.0]])
    assert expr[0, 1](4.0) == pytest.approx(8.0)


def test_config():
    assert config["operators.cartesian.laplacian_2d_corner_weight"] == 0.0
    with config({"operators.cartesian.laplacian_2d_corner_weight": 0.5}):
        assert config["operators.cartesian.laplacian_2d_corner_weight"] == 0.5
    assert config["operators.cartesian.laplacian_2d_corner_weight"] == 0.0
    cfg = Config([Parameter("a.b", 1, int)], mode="update")
    cfg["a.b"] = "7"
    assert cfg["a.b"] == 7
    with pytest.raises(KeyError):
        cfg["a.c"] = 2
    env = environment()
    assert "jax version" in env


def test_online_statistics():
    stats = OnlineStatistics()
    values = [1.0, 2.0, 3.0, 4.0]
    for v in values:
        stats.add(v)
    assert stats.count == 4
    assert stats.mean == pytest.approx(2.5)
    assert stats.min == 1.0 and stats.max == 4.0
    stats2 = OnlineStatistics()
    stats2.add_batch(4, sum(values), min(values), max(values))
    assert stats2.mean == pytest.approx(2.5)


def test_smooth_data_1d(rng):
    xs = np.linspace(0, 2 * np.pi, 200)
    ys = np.sin(xs) + 0.1 * rng.normal(size=xs.size)
    smooth = SmoothData1D(xs, ys)
    assert smooth(np.pi / 2) == pytest.approx(1.0, abs=0.2)
    assert abs(smooth.derivative(np.pi)) < 2


def test_parse_duration():
    assert parse_duration("90").total_seconds() == 90
    assert parse_duration("1:30").total_seconds() == 90
    assert parse_duration("1:00:00").total_seconds() == 3600


def test_correlated_noise(rng):
    shape = (32, 32)
    noise = make_correlated_noise(shape, "gaussian", length_scale=3, rng=rng)
    samples = np.array([noise() for _ in range(10)])
    assert samples.shape == (10, 32, 32)
    assert np.all(np.isfinite(samples))
    # white noise has unit variance
    white = make_correlated_noise(shape, "none", rng=rng)
    data = np.array([white() for _ in range(50)])
    assert np.var(data) == pytest.approx(1.0, rel=0.2)
    # power-law and cosine paths execute
    make_correlated_noise(shape, "power law", exponent=-2, rng=rng)()
    make_correlated_noise(shape, "cosine", length_scale=4, rng=rng)()
    with pytest.raises(ValueError):
        make_correlated_noise(shape, "bogus")
