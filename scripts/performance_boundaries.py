"""Performance of different boundary-condition implementations.

TPU-native port of `/root/reference/scripts/performance_boundaries.py`: times
the Laplacian with scalar / array-valued / virtual-point-expression /
time-dependent boundary conditions. On the remote axon tunnel per-call
dispatch dominates small grids, so steps are batched inside one jitted
`fori_loop` per measurement.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import pde_tpu as pde


def measure(op, data, args=None, steps: int = 200) -> float:
    """Calls/second of `op` chained `steps` times on device."""

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, steps, lambda i, d: op(d, 1.0, args), x)

    x = loop(data)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    x = loop(x)
    float(jnp.sum(x))
    return steps / (time.perf_counter() - t0)


def main() -> None:
    print("Reports laplace calls-per-second (larger is better)\n")
    for size in [32, 512]:
        grid = pde.UnitGrid([size, size], periodic=False)
        print(grid)
        field = pde.ScalarField.random_normal(
            grid, rng=np.random.default_rng(0), dtype=np.float32
        )
        bc_value = np.ones(size)

        cases = {
            "scalar": {"value": 1},
            "array": {"value": bc_value},
            "function": {"virtual_point": "2 - value"},
            "time-dependent": {"value_expression": "t"},
        }
        for name, bc in cases.items():
            op = grid.make_operator("laplace", bc=bc)
            rate = measure(op, jnp.asarray(field.data))
            print(f"  {name:>15}: {rate:9.0f} calls/s")
        print()


if __name__ == "__main__":
    main()
