"""Second depth pass over utils: expressions, evaluate, config modes, caching,
serializers, and spectral noise — mirroring `tests/tools/` of the reference."""

import numpy as np
import pytest

import pde_tpu as pde
from pde_tpu.utils.cache import (
    DictFiniteCapacity,
    hash_mutable,
    make_serializer,
    make_unserializer,
    objects_equal,
)
from pde_tpu.utils.expressions import ScalarExpression, TensorExpression
from pde_tpu.utils.expressions_eval import evaluate
from pde_tpu.utils.spectral import make_correlated_noise

# -- expressions -----------------------------------------------------------------------


def test_expression_constants():
    for expr_str, value in [("1", 1.0), ("pi", np.pi), ("E", np.e), ("2.5 + 1.5", 4.0)]:
        expr = ScalarExpression(expr_str)
        assert expr.constant
        np.testing.assert_allclose(expr.value, value)
    nonconst = ScalarExpression("2 * x", signature=["x"])
    assert not nonconst.constant
    with pytest.raises(TypeError):
        nonconst.value


def test_expression_is_zero_and_bool():
    assert ScalarExpression("0").is_zero
    assert not ScalarExpression("1").is_zero
    assert bool(ScalarExpression("x", signature=["x"]))
    assert not bool(ScalarExpression("0"))


def test_expression_copy_independent():
    expr = ScalarExpression("a * b", signature=["a", "b"])
    dup = expr.copy()
    assert dup.expression == expr.expression
    assert dup(2, 3) == expr(2, 3) == 6


def test_expression_depends_on():
    expr = ScalarExpression("2 * x + sin(y)", signature=["x", "y", "z"])
    assert expr.depends_on_variable("x")
    assert expr.depends_on_variable("y")
    assert not expr.depends_on_variable("z")


def test_expression_differentiate():
    expr = ScalarExpression("x**2 * y", signature=["x", "y"])
    dx = expr.differentiate("x")
    np.testing.assert_allclose(dx(3.0, 2.0), 12.0)
    derivs = expr.derivatives
    assert derivs.shape == (2,)
    np.testing.assert_allclose(derivs[1](3.0, 2.0), 9.0)


def test_expression_single_vs_multi_args(rng):
    expr = ScalarExpression("a + b", signature=["a", "b"])
    a, b = rng.uniform(size=2)
    assert expr(a, b) == pytest.approx(a + b)
    compiled = expr.get_compiled()
    np.testing.assert_allclose(np.asarray(compiled(a, b)), a + b)


def test_expression_complex():
    expr = ScalarExpression("sqrt(-1) * x", signature=["x"], allow_complex=True) \
        if "allow_complex" in ScalarExpression.__init__.__code__.co_varnames \
        else ScalarExpression("I * x", signature=["x"])
    assert expr.complex
    np.testing.assert_allclose(complex(expr(2.0)), 2j)


@pytest.mark.parametrize(
    "expression, value",
    [("Heaviside(x)", 0.5), ("heaviside(x, 0.75)", 0.75)],
)
def test_expression_heaviside(expression, value):
    expr = ScalarExpression(expression, signature=["x"])
    np.testing.assert_allclose(expr(-1.0), 0.0)
    np.testing.assert_allclose(expr(0.0), value)
    np.testing.assert_allclose(expr(1.0), 1.0)


def test_expression_hypot():
    expr = ScalarExpression("hypot(x, y)", signature=["x", "y"])
    np.testing.assert_allclose(expr(3.0, 4.0), 5.0)


def test_tensor_expression_basics():
    expr = TensorExpression([["x", "2"], ["y", "x*y"]], signature=["x", "y"])
    assert expr.shape == (2, 2)
    assert expr.rank == 2
    result = np.asarray(expr(3.0, 5.0))
    np.testing.assert_allclose(result, [[3, 2], [5, 15]])
    # element access yields scalar expressions
    np.testing.assert_allclose(expr[1, 1](3.0, 5.0), 15.0)


def test_tensor_expression_constant_value():
    expr = TensorExpression([[1, 2], [3, 4]])
    assert expr.constant
    np.testing.assert_allclose(np.asarray(expr.value), [[1, 2], [3, 4]])


def test_tensor_expression_differentiate():
    expr = TensorExpression(["x**2", "x*y"], signature=["x", "y"])
    dx = expr.differentiate("x")
    np.testing.assert_allclose(np.asarray(dx(3.0, 2.0)), [6.0, 2.0])


def test_expression_user_funcs_and_consts():
    expr = ScalarExpression(
        "f(x) + c", signature=["x"], user_funcs={"f": lambda x: x**2}, consts={"c": 10}
    )
    np.testing.assert_allclose(expr(3.0), 19.0)


def test_expression_guarding_blocks_attributes():
    with pytest.raises(Exception):
        ScalarExpression("__import__('os').system('true')")


# -- evaluate over fields ----------------------------------------------------------------


def test_evaluate_scalar_ops(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    a = pde.ScalarField.random_uniform(grid, rng=rng)
    b = pde.ScalarField.random_uniform(grid, rng=rng)
    res = evaluate("a * b + 1", {"a": a, "b": b})
    np.testing.assert_allclose(res.to_numpy(), a.to_numpy() * b.to_numpy() + 1, atol=1e-12)
    res = evaluate("laplace(a)", {"a": a}, bc="periodic")
    np.testing.assert_allclose(
        res.to_numpy(), a.laplace("periodic").to_numpy(), atol=1e-12
    )


def test_evaluate_vector_result(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    a = pde.ScalarField.random_uniform(grid, rng=rng)
    res = evaluate("gradient(a)", {"a": a}, bc="periodic")
    assert isinstance(res, pde.VectorField)
    np.testing.assert_allclose(
        res.to_numpy(), a.gradient("periodic").to_numpy(), atol=1e-12
    )


def test_evaluate_dot_and_divergence(rng):
    grid = pde.UnitGrid([8, 8], periodic=True)
    v = pde.VectorField.random_uniform(grid, rng=rng)
    res = evaluate("divergence(v)", {"v": v}, bc="periodic")
    np.testing.assert_allclose(
        res.to_numpy(), v.divergence("periodic").to_numpy(), atol=1e-12
    )
    dot = evaluate("dot(v, v)", {"v": v})
    np.testing.assert_allclose(
        dot.to_numpy(), np.einsum("i...,i...->...", v.to_numpy(), v.to_numpy()),
        atol=1e-12,
    )


def test_evaluate_requires_common_grid(rng):
    a = pde.ScalarField.random_uniform(pde.UnitGrid([4, 4]), rng=rng)
    b = pde.ScalarField.random_uniform(pde.UnitGrid([8, 8]), rng=rng)
    with pytest.raises(ValueError):
        evaluate("a + b", {"a": a, "b": b})
    with pytest.raises(ValueError):
        evaluate("1", {})


def test_evaluate_consts_and_coordinates(rng):
    grid = pde.CartesianGrid([[0, 2]], [16])
    a = pde.ScalarField(grid, 1.0)
    res = evaluate("a * x + c", {"a": a}, consts={"c": 2.0})
    x = np.asarray(grid.coordinate_arrays[0])
    np.testing.assert_allclose(res.to_numpy(), x + 2.0, atol=1e-12)


# -- config ------------------------------------------------------------------------------


def test_config_modes():
    from pde_tpu.utils.config import Config, Parameter

    cfg = Config([Parameter("a", 1, int, "doc")], mode="update")
    cfg["a"] = 5
    assert cfg["a"] == 5
    with pytest.raises(KeyError):
        cfg["unknown"]

    locked = Config([Parameter("a", 1, int, "doc")], mode="locked")
    with pytest.raises(RuntimeError):
        locked["a"] = 2

    insert = Config(mode="insert")
    insert["fresh.key"] = 3
    assert insert["fresh.key"] == 3


def test_config_to_dict_and_iter():
    cfg = pde.config
    d = cfg.to_dict()
    assert isinstance(d, dict) and len(d) > 0
    assert set(iter(cfg)) == set(d.keys())


def test_config_temporary_override_restores_on_error():
    original = pde.config["operators.cartesian.laplacian_2d_corner_weight"]
    try:
        with pde.config({"operators.cartesian.laplacian_2d_corner_weight": 0.5}):
            assert pde.config["operators.cartesian.laplacian_2d_corner_weight"] == 0.5
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert pde.config["operators.cartesian.laplacian_2d_corner_weight"] == original


# -- caching / serializers ------------------------------------------------------------------


def test_objects_equal_variants():
    assert objects_equal(1, 1.0)
    assert objects_equal([1, 2], [1, 2])
    assert objects_equal({"a": np.arange(3)}, {"a": np.arange(3)})
    assert not objects_equal({"a": 1}, {"a": 2})
    assert not objects_equal([1], [1, 2])


def test_hash_mutable_stability():
    assert hash_mutable({"a": [1, 2]}) == hash_mutable({"a": [1, 2]})
    assert hash_mutable({"a": 1, "b": 2}) == hash_mutable({"b": 2, "a": 1})
    assert hash_mutable(np.arange(4)) == hash_mutable(np.arange(4))


@pytest.mark.parametrize("method", ["json", "pickle", "hash_readable"])
def test_serializer_roundtrip(method):
    ser = make_serializer(method)
    data = {"a": 1, "b": [1, 2]}
    blob = ser(data)
    if method == "json":
        # canonical: key order does not matter
        assert blob == ser({"b": [1, 2], "a": 1})
        assert make_unserializer(method)(blob) == {"a": 1, "b": [1, 2]}
    elif method == "pickle":
        import pickle

        assert pickle.loads(blob) == data


def test_serializer_unknown_method():
    with pytest.raises(ValueError):
        make_serializer("nonsense")
    with pytest.raises(ValueError):
        make_unserializer("nonsense")


def test_dict_finite_capacity_eviction():
    d = DictFiniteCapacity(capacity=2)
    d["a"] = 1
    d["b"] = 2
    d["c"] = 3
    assert "a" not in d
    assert d["b"] == 2 and d["c"] == 3


# -- spectral noise --------------------------------------------------------------------


@pytest.mark.parametrize(
    "correlation, kwargs",
    [
        ("none", {}),
        ("gaussian", {"length_scale": 2.0}),
        ("power law", {"exponent": -2.0}),
        ("cosine", {"length_scale": 4.0}),
    ],
)
def test_correlated_noise_shapes(correlation, kwargs, rng):
    shape = (32, 32)
    noise = make_correlated_noise(shape, correlation, rng=rng, **kwargs)
    sample = noise()
    assert sample.shape == shape
    assert np.all(np.isfinite(sample))
    # zero mean within statistical fluctuation
    assert abs(sample.mean()) < 5 / np.sqrt(np.prod(shape))


def test_correlated_noise_gaussian_lengthscale(rng):
    """Longer correlation length → smoother field (smaller gradient power)."""
    shape = (64, 64)

    def roughness(length_scale):
        noise = make_correlated_noise(
            shape, "gaussian", length_scale=length_scale, rng=rng
        )
        samples = [noise() for _ in range(8)]
        return np.mean([np.mean(np.diff(s, axis=0) ** 2) / np.var(s) for s in samples])

    assert roughness(4.0) < roughness(1.0)


def test_expression_indexed_cartesian_coordinates():
    """`cartesian[i]` exposes Cartesian coordinates, incl. curvilinear grids
    (reference `fields/scalar.py:75`, manual 'advanced usage')."""
    grid = pde.CylindricalSymGrid(2.0, (0, 1), (4, 4))
    field = pde.ScalarField.from_expression(grid, "cartesian[2] + 2")
    z = np.asarray(grid.cell_coords)[..., 1]
    np.testing.assert_allclose(np.asarray(field.data), z + 2, atol=1e-12)

    cart = pde.UnitGrid([4, 4])
    v = pde.VectorField.from_expression(cart, ["cartesian[0]", "cartesian[1] * 3"])
    coords = np.asarray(cart.cell_coords)
    np.testing.assert_allclose(np.asarray(v.data[0]), coords[..., 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(v.data[1]), 3 * coords[..., 1], atol=1e-12)
