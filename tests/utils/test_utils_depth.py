"""Utility-layer depth: config system, caching, spectral noise, expressions,
cuboid geometry, duration parsing, math helpers.

Extends toward the reference tools suites (`/root/reference/tests/tools/`).
"""

import numpy as np
import pytest

import pde_tpu as pde


# -- config system (reference `tools/config.py:58,385`) --------------------------------


def test_config_dotted_access():
    cfg = pde.config
    value = cfg["operators.cartesian.laplacian_2d_corner_weight"]
    assert isinstance(value, (int, float))


def test_config_context_override():
    cfg = pde.config
    original = cfg["operators.conservative_stencil"]
    with cfg({"operators.conservative_stencil": not original}):
        assert cfg["operators.conservative_stencil"] == (not original)
    assert cfg["operators.conservative_stencil"] == original


def test_config_unknown_key():
    with pytest.raises(KeyError):
        pde.config["no.such.key"]


def test_environment_report():
    env = pde.environment()
    assert "package version" in env or "platform" in env or env


def test_parameter_dataclass():
    p = pde.Parameter("answer", 42, int, "the answer")
    assert p.name == "answer"
    assert p.convert("7") == 7


# -- caching (reference `tools/cache.py:607,660`) ---------------------------------------


def test_cached_method_hits():
    from pde_tpu.utils.cache import cached_method

    calls = {"n": 0}

    class Thing:
        @cached_method()
        def compute(self, x):
            calls["n"] += 1
            return x * 2

    t = Thing()
    assert t.compute(3) == 6
    assert t.compute(3) == 6
    assert calls["n"] == 1
    assert t.compute(4) == 8
    assert calls["n"] == 2


def test_hash_mutable_arrays():
    from pde_tpu.utils.cache import hash_mutable

    a = np.arange(5)
    b = np.arange(5)
    assert hash_mutable(a) == hash_mutable(b)
    assert hash_mutable({"x": [1, 2]}) == hash_mutable({"x": [1, 2]})


# -- spectral correlated noise (reference `tools/spectral.py:39`) ------------------------


def test_correlated_noise_statistics(rng):
    from pde_tpu.utils.spectral import make_correlated_noise

    noise_fn = make_correlated_noise((256,), correlation="gaussian",
                                     discretization=np.array([1.0]),
                                     length_scale=5.0, rng=rng)
    samples = np.array([noise_fn() for _ in range(32)])
    # zero mean, unit-ish variance
    assert abs(samples.mean()) < 0.1
    # neighboring points are positively correlated at this length scale
    corr = np.mean(samples[:, :-1] * samples[:, 1:])
    assert corr > 0.3  # strongly positive vs ~0 for white noise


def test_colored_field_spectrum_slope(rng):
    """random_colored(exponent=-2) has a red (decaying) spectrum."""
    grid = pde.UnitGrid([256], periodic=True)
    field = pde.ScalarField.random_colored(grid, exponent=-2, rng=rng)
    spectrum = np.abs(np.fft.rfft(np.asarray(field.data))) ** 2
    low = spectrum[1:10].mean()
    high = spectrum[-10:].mean()
    assert low > 10 * high


# -- expressions (reference `tools/expressions.py`) --------------------------------------


def test_scalar_expression_derivatives():
    expr = pde.ScalarExpression("x**2 * sin(y)", signature=["x", "y"])
    dx = expr.derivatives
    assert expr(2.0, 0.0) == pytest.approx(0.0)
    assert expr(1.0, np.pi / 2) == pytest.approx(1.0)


def test_scalar_expression_constants_detection():
    expr = pde.ScalarExpression("2 * x + 1", signature=["x"])
    assert not expr.constant
    const = pde.ScalarExpression("3.5")
    assert const.constant
    assert const() == pytest.approx(3.5)


def test_tensor_expression_shape():
    expr = pde.TensorExpression("[[x, 0], [0, y]]", signature=["x", "y"])
    value = np.asarray(expr(2.0, 3.0))
    np.testing.assert_allclose(value, [[2.0, 0.0], [0.0, 3.0]])


def test_expression_user_functions():
    expr = pde.ScalarExpression(
        "double(x) + 1", signature=["x"], user_funcs={"double": lambda x: 2 * x}
    )
    assert expr(4.0) == pytest.approx(9.0)


def test_evaluate_with_bcs(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng, label="u")
    res = pde.evaluate("laplace(u)", {"u": field})
    expected = field.laplace("auto_periodic_neumann")
    np.testing.assert_allclose(np.asarray(res.data),
                               np.asarray(expected.data), atol=1e-12)


def test_evaluate_binary_ops(rng):
    grid = pde.UnitGrid([4, 4])
    a = pde.ScalarField.random_uniform(grid, rng=rng, label="a")
    b = pde.ScalarField.random_uniform(grid, rng=rng, label="b")
    res = pde.evaluate("a * b + 1", {"a": a, "b": b})
    np.testing.assert_allclose(
        np.asarray(res.data), np.asarray(a.data) * np.asarray(b.data) + 1,
        rtol=1e-12,
    )


# -- misc tools ---------------------------------------------------------------------------


def test_parse_duration():
    from pde_tpu.utils.parse_duration import parse_duration

    assert parse_duration("0:01:30").total_seconds() == pytest.approx(90)
    assert parse_duration("2:00:00").total_seconds() == pytest.approx(7200)


def test_cuboid_geometry():
    from pde_tpu.utils.cuboid import Cuboid

    c = Cuboid([0, 0], [2, 3])
    assert c.volume == pytest.approx(6)
    assert c.contains_point([1, 1]).all()
    assert not c.contains_point([5, 5]).all()


def test_online_statistics():
    from pde_tpu.utils.math import OnlineStatistics

    stats = OnlineStatistics()
    for v in [1.0, 2.0, 3.0, 4.0]:
        stats.add(v)
    assert stats.mean == pytest.approx(2.5)
    assert stats.min == 1.0 and stats.max == 4.0
    assert stats.count == 4


def test_smooth_data_1d():
    from pde_tpu.utils.math import SmoothData1D

    x = np.linspace(0, 10, 500)
    y = np.sin(x) + 0.01 * np.random.default_rng(0).normal(size=500)
    smooth = SmoothData1D(x, y, sigma=0.2)
    assert smooth(5.0) == pytest.approx(np.sin(5.0), abs=0.1)


def test_estimate_computation_speed():
    from pde_tpu.utils.misc import estimate_computation_speed

    speed = estimate_computation_speed(lambda: sum(range(100)))
    assert speed > 0


def test_preserve_scalars_and_number_array():
    from pde_tpu.utils.misc import number_array

    arr = number_array([1, 2, 3])
    assert arr.dtype in (np.dtype(float), np.dtype(int), np.dtype(complex))
    arr_c = number_array([1 + 2j])
    assert np.iscomplexobj(arr_c)


def test_config_flags_drive_operators(rng):
    """Global config flags change operator behavior (reference
    `tools/config.py:618-635` wiring)."""
    grid = pde.UnitGrid([8, 8], periodic=True)
    field = pde.ScalarField.random_uniform(grid, rng=rng)
    base = np.asarray(field.laplace("periodic").data)
    with pde.config({"operators.cartesian.laplacian_2d_corner_weight": 1 / 3}):
        nine = np.asarray(field.laplace("periodic").data)
    assert not np.allclose(base, nine)
    # flag restored after the context
    again = np.asarray(field.laplace("periodic").data)
    np.testing.assert_allclose(again, base)


def test_conservative_stencil_flag(rng):
    grid = pde.SphericalSymGrid(2, 24)
    field = pde.ScalarField.random_colored(grid, exponent=-4, rng=rng)
    with pde.config({"operators.conservative_stencil": True}):
        cons = np.asarray(field.laplace({"derivative": 0}).data)
    with pde.config({"operators.conservative_stencil": False}):
        direct = np.asarray(field.laplace({"derivative": 0}).data)
    # both approximate the same Laplacian but differ at the stencil level
    # (largest deviations sit near r=0 where the flux form is better behaved)
    assert not np.array_equal(cons, direct)
    np.testing.assert_allclose(cons[8:], direct[8:], rtol=0.5, atol=2.0)
