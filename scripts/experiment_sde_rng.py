"""XLA SDE path: threefry vs RngBitGenerator keys on the real chip.

The round-2 negative (docs/BENCHMARKS.md) established the fused SDE window
is generation-bound; the XLA path's cost is likewise dominated by
`jax.random.normal` (threefry2x32 bit generation + erfinv).  JAX keys carry
their bit-generator impl, so `jax.random.key(seed, impl="rbg")` routes ALL
downstream split/fold_in/normal through the XLA RngBitGenerator — the TPU's
hardware PRNG — without touching solver code.  This measures the effect on
a full Euler-Maruyama window (the `sde.rng_impl` config knob).

Usage: python scripts/experiment_sde_rng.py [n=4096] [steps=1000]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000


def run(impl: str, dist: str) -> float:
    import pde_tpu as pde
    from pde_tpu.solvers.euler import EulerSolver

    grid = pde.UnitGrid([N, N], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    eq = pde.DiffusionPDE(diffusivity=0.1, noise=1.0)
    dt = 1e-5
    with pde.config({"sde.rng_impl": impl, "sde.increment_dist": dist}):
        solver = EulerSolver(eq, backend="jax")
        stepper = solver.make_stepper(state, dt=dt)
    # warmup/compile (stepper contract: (state, t_start, t_end) -> (state, t))
    out, _ = stepper(state, 0.0, 10 * dt)
    float(jnp.sum(out.data))
    t0 = time.perf_counter()
    out, _ = stepper(state, 0.0, STEPS * dt)
    s = float(jnp.sum(out.data))
    dt_wall = time.perf_counter() - t0
    rate = N * N * STEPS / dt_wall
    var = float(jnp.var(out.data))
    print(
        f"impl={impl:12s} dist={dist:10s}: {rate:.3e} updates/s  "
        f"(var={var:.5f}, sum={s:.2f})",
        flush=True,
    )
    return rate


def main():
    print(f"n={N} steps={STEPS} (XLA path, fused disabled via env)")
    for impl in ("threefry2x32", "rbg"):
        for dist in ("normal", "irwin4", "rademacher"):
            try:
                run(impl, dist)
            except Exception as err:  # noqa: BLE001 - report and continue
                print(f"impl={impl} dist={dist}: FAILED {type(err).__name__}: {err}")


if __name__ == "__main__":
    import os

    os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
    main()
