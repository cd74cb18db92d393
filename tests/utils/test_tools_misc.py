"""Tests for utility helpers: cache, misc, cuboid, ffmpeg table, output."""

import numpy as np
import pytest

from pde_tpu.utils.cache import (
    DictFiniteCapacity,
    cached_method,
    cached_property,
    hash_mutable,
    make_serializer,
    objects_equal,
)
from pde_tpu.utils.cuboid import Cuboid
from pde_tpu.utils.ffmpeg import find_format, formats
from pde_tpu.utils.misc import (
    classproperty,
    estimate_computation_speed,
    get_array_namespace,
    hybridmethod,
    module_available,
    number,
    number_array,
    preserve_scalars,
)
from pde_tpu.utils.output import display_progress, get_progress_bar_class


def test_hash_mutable():
    assert hash_mutable([1, 2]) == hash_mutable([1, 2])
    assert hash_mutable({"a": 1}) == hash_mutable({"a": 1})
    assert hash_mutable(np.arange(3)) == hash_mutable(np.arange(3))
    assert hash_mutable({"a": [1, {2}]}) == hash_mutable({"a": [1, {2}]})
    assert hash_mutable([1, 2]) != hash_mutable([2, 1])


def test_objects_equal():
    assert objects_equal([1, np.arange(2)], [1, np.arange(2)])
    assert objects_equal({"a": np.zeros(2)}, {"a": np.zeros(2)})
    assert not objects_equal([1], [2])


def test_cached_property_and_method():
    class Demo:
        calls = 0

        @cached_property
        def value(self):
            Demo.calls += 1
            return 42

        @cached_method
        def compute(self, x):
            Demo.calls += 1
            return x * 2

    d = Demo()
    assert d.value == 42 and d.value == 42
    assert Demo.calls == 1
    assert d.compute(3) == 6 and d.compute(3) == 6
    assert Demo.calls == 2
    assert d.compute(np.arange(2)) == pytest.approx(np.arange(2) * 2)


def test_dict_finite_capacity():
    d = DictFiniteCapacity(capacity=2)
    d["a"] = 1
    d["b"] = 2
    d["c"] = 3
    assert "a" not in d and len(d) == 2


def test_serializers():
    assert make_serializer("json")({"a": 1}) == b'{"a": 1}'
    assert make_serializer("hash_mutable")([1, 2]) == hash_mutable([1, 2])
    with pytest.raises(ValueError):
        make_serializer("bogus")


def test_cuboid():
    c = Cuboid([0, 0], [2, 3])
    assert c.dim == 2
    assert c.volume == 6
    assert c.diagonal == pytest.approx(np.sqrt(13))
    assert c.surface_area == pytest.approx(10)
    np.testing.assert_allclose(c.centroid, [1, 1.5])
    assert c.bounds == ((0.0, 2.0), (0.0, 3.0))
    # negative size normalization
    c2 = Cuboid([2, 3], [-2, -3])
    assert c2 == c
    # from_points / from_bounds / from_centerpoint
    assert Cuboid.from_points([0, 0], [2, 3]) == c
    assert Cuboid.from_bounds([[0, 2], [0, 3]]) == c
    assert Cuboid.from_centerpoint([1, 1.5], [2, 3]) == c
    # union and buffer
    u = c + Cuboid([1, 1], [3, 3])
    assert u.bounds == ((0.0, 4.0), (0.0, 4.0))
    assert c.buffer(1).bounds == ((-1.0, 3.0), (-1.0, 4.0))
    # containment
    assert c.contains_point([1, 1])
    assert not c.contains_point([3, 1])
    # immutability
    frozen = Cuboid([0], [1], mutable=False)
    with pytest.raises(RuntimeError):
        frozen.pos = [1]


def test_ffmpeg_formats():
    assert find_format(1, 8) is not None
    fmt = formats["gray16le"]
    frame = fmt.data_to_frame(np.array([0.0, 0.5, 1.0]))
    assert frame.dtype == np.uint16
    back = fmt.data_from_frame(frame)
    np.testing.assert_allclose(back, [0, 0.5, 1.0], atol=1e-4)


def test_misc_helpers():
    assert module_available("numpy")
    assert not module_available("definitely_not_a_module_xyz")
    assert number("2") == 2 and isinstance(number("2"), int)
    assert number("2.5") == 2.5
    assert number("1+2j") == 1 + 2j
    arr = number_array([1, 2, 3])
    assert arr.dtype == np.float64
    import jax.numpy as jnp

    assert get_array_namespace(jnp.zeros(2)) is jnp
    assert get_array_namespace(np.zeros(2)) is np


def test_classproperty_hybridmethod():
    class Demo:
        _value = 7

        @classproperty
        def value(cls):  # noqa: N805
            return cls._value

        @hybridmethod
        def info(cls):  # noqa: N805
            return "class"

        @info.instancemethod
        def info(self):
            return "instance"

    assert Demo.value == 7
    assert Demo.info() == "class"
    assert Demo().info() == "instance"


def test_estimate_computation_speed():
    speed = estimate_computation_speed(lambda x: x**2, 2, test_duration=0.05)
    assert speed > 100


def test_preserve_scalars():
    class Demo:
        @preserve_scalars
        def double(self, x):
            return 2 * x

    d = Demo()
    assert np.isscalar(d.double(2.0)) or d.double(2.0).ndim == 0
    assert d.double(np.array([1.0, 2.0])).shape == (2,)


def test_progress():
    cls = get_progress_bar_class()
    assert list(display_progress([1, 2, 3])) == [1, 2, 3]
    assert list(display_progress([1, 2], enabled=False)) == [1, 2]


def test_mpi_shim():
    from pde_tpu.utils import mpi

    assert mpi.size >= 1
    assert mpi.rank == 0
    assert mpi.is_main
    assert mpi.mpi_bcast(42) == 42
    with pytest.raises(NotImplementedError):
        mpi.mpi_send(None, 0)
