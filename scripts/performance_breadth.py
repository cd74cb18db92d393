"""Benchmark breadth: curvilinear operators, adaptive solvers, dryrun scaling.

Complements the headline benchmarks (bench.py, performance_solvers.py) with
the remaining axes the reference covers: curvilinear-grid operator
throughput, adaptive-solver time-to-solution, and (CPU-mesh) decomposition
scaling of the compiled window.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import pde_tpu as pde


def _rate(op, data, steps=200):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, steps, lambda i, d: op(d, 1.0, None), x)

    x = loop(data)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    x = loop(x)
    float(jnp.sum(x))
    return steps * data.size / (time.perf_counter() - t0)


def curvilinear() -> None:
    print("## Curvilinear laplace throughput (cell-updates/s)")
    grids = {
        "polar 1M": pde.PolarSymGrid(10, 2**20),
        "spherical 1M": pde.SphericalSymGrid(10, 2**20),
        "cylindrical 1024^2": pde.CylindricalSymGrid(10, (0, 10), (1024, 1024)),
    }
    for name, grid in grids.items():
        field = pde.ScalarField.random_uniform(
            grid, rng=np.random.default_rng(0), dtype=np.float32
        )
        op = grid.make_operator("laplace", bc={"derivative": 0})
        print(f"  {name:>20}: {_rate(op, jnp.asarray(field.data)):.3g}")


def adaptive() -> None:
    print("## Adaptive RK45, Cahn-Hilliard 256^2 to t=10")
    grid = pde.UnitGrid([256, 256], periodic=True)
    state = pde.ScalarField.random_uniform(
        grid, -0.1, 0.1, rng=np.random.default_rng(0), dtype=np.float32
    )
    eq = pde.CahnHilliardPDE()
    t0 = time.perf_counter()
    result, info = eq.solve(
        state, t_range=10, dt=1e-4, solver="runge-kutta", adaptive=True,
        tolerance=1e-3, tracker=None, ret_info=True,
    )
    elapsed = time.perf_counter() - t0
    steps = info["solver"]["steps"]
    stats = info["solver"]["dt_statistics"]
    print(
        f"  {elapsed:.2f} s, {steps} accepted steps, dt in "
        f"[{stats.min:.2e}, {stats.max:.2e}], "
        f"{256 * 256 * steps / elapsed:.3g} cell-updates/s"
    )


def main() -> None:
    curvilinear()
    adaptive()


if __name__ == "__main__":
    main()
