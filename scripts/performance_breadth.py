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


def cylindrical_fused() -> None:
    """Fused cylindrical Euler window vs XLA lowering (see BENCHMARKS.md)."""
    import os

    from pde_tpu.solvers import EulerSolver

    print("## Cylindrical diffusion 2048x2048 fp32 (fused vs XLA)")
    grid = pde.CylindricalSymGrid(1.0, (0, 2), (2048, 2048))
    field = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
    field = pde.ScalarField(grid, data=np.asarray(field.data, dtype=np.float32))
    eq = pde.DiffusionPDE(0.1, bc={"r": {"derivative": 0}, "z": {"derivative": 0}})
    dt = 1e-8
    for disable in (True, False):
        if disable:
            os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
        else:
            os.environ.pop("PDE_TPU_DISABLE_FUSED", None)
        solver = EulerSolver(eq)
        stepper = solver.make_stepper(field, dt)
        out, _ = stepper(field, 0.0, 100 * dt)
        float(jnp.sum(out.data))
        t0 = time.perf_counter()
        out, _ = stepper(field, 0.0, 2000 * dt)
        float(jnp.sum(out.data))
        rate = 2000 * grid.num_cells / (time.perf_counter() - t0)
        label = "XLA" if disable else "fused"
        print(f"  {label:>6}: {rate:.3e} cell-updates/s "
              f"(fused_step={solver.info.get('fused_step', False)})")


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
    cylindrical_fused()
    adaptive()


if __name__ == "__main__":
    main()
