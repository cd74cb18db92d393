"""Compatibility facade for the reference's backend registry.

The reference (`/root/reference/pde/backends/`) maintains six compute backends
(numpy/numba/numba_mpi/jax/torch/scipy) because it must JIT Python loops in
several ways. This framework has ONE compute path — XLA — so the "backend"
object is a thin facade delegating to the grid/operator layer. It exists so
code written against the reference's `get_backend(...)` API keeps working.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


class XLABackend:
    """The single compute backend: JAX/XLA (with Pallas fast paths)."""

    name = "jax"
    implementation = "jax"

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}(devices={[str(d) for d in jax.devices()]})"

    # -- data movement ------------------------------------------------------------
    def numpy_to_native(self, arr, dtype=None):
        return jnp.asarray(arr, dtype=dtype)

    def native_to_numpy(self, arr):
        return np.asarray(arr)

    # -- compilation ----------------------------------------------------------------
    def compile_function(self, func: Callable, **kwargs) -> Callable:
        return jax.jit(func, **kwargs)

    # -- factories (delegate to the grid/operator layer) -------------------------------
    def make_operator(self, grid, operator: str, bc, **kwargs) -> Callable:
        return grid.make_operator(operator, bc=bc, **kwargs)

    def make_operator_no_bc(self, grid, operator: str, **kwargs) -> Callable:
        return grid.make_operator_no_bc(operator, **kwargs)

    def get_operator_info(self, grid, operator: str):
        return grid._get_operator_info(operator)

    def make_ghost_cell_setter(self, bcs) -> Callable:
        return bcs.make_ghost_setter()

    def make_integrator(self, grid) -> Callable:
        return lambda arr: grid.integrate(arr)

    def make_interpolator(self, field, **kwargs) -> Callable:
        return field.make_interpolator(**kwargs)

    def make_inner_prod_operator(self, field, **kwargs) -> Callable:
        return field.make_dot_operator(**kwargs)

    def make_outer_prod_operator(self, field) -> Callable:
        return field.make_outer_prod_operator()

    def make_pde_rhs(self, pde, state) -> Callable:
        return pde.make_pde_rhs(state)

    def make_expression_function(self, expression, **kwargs) -> Callable:
        return expression._get_function(backend="jax", **kwargs)

    def make_mpi_synchronizer(self, operator: str = "MAX", **kwargs) -> Callable:
        # single-program SPMD: synchronization happens via collectives inside
        # shard_map; outside it, the identity is correct
        return lambda value: value

    def make_gaussian_noise(self, state, rng=None) -> Callable:
        seed = int(np.random.default_rng(rng).integers(0, 2**31 - 1))
        key_holder = {"key": jax.random.key(seed)}
        shape = np.asarray(state.data).shape

        def noise():
            key_holder["key"], sub = jax.random.split(key_holder["key"])
            return jax.random.normal(sub, shape)

        return noise

    def make_stepper(self, solver, state, dt=None) -> Callable:
        return solver.make_stepper(state, dt)


_BACKENDS: dict[str, Any] = {}


class BackendRegistry(dict):
    """Registry mapping backend names to instances (reference `registry.py:36`)."""

    def __missing__(self, key):
        base = key.split(":")[0]
        if base in ("jax", "auto", "numpy", "numba", "numba_mpi", "torch", "scipy", "pallas"):
            instance = XLABackend()
            self[key] = instance
            return instance
        raise KeyError(f"Backend `{key}` is not registered")


backends = BackendRegistry()


def get_backend(backend: str = "auto") -> XLABackend:
    """Return the compute backend (always XLA; names accepted for compatibility)."""
    if isinstance(backend, XLABackend):
        return backend
    return backends[str(backend)]


#: Compatibility alias: the reference's abstract engine base class
#: (`backends/base.py:65`); this framework has one XLA engine.
BackendBase = XLABackend


def registered_backends() -> list[str]:
    """Names resolvable by :func:`get_backend` (reference `registry.py:36`)."""
    return ["auto", "jax", "numba", "numba_mpi", "numpy", "pallas", "scipy",
            "torch"]
