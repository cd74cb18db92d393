"""Fused SDE window with in-kernel hardware-PRNG noise vs the alternatives.

Round-2 negative: the fused SDE window staged XLA-threefry increments
through HBM and LOST to the XLA path (14.5 vs 21.3 G updates/s, KPZ 4096²).
This measures the round-3 design — increments drawn inside the kernel from
`pltpu.prng_random_bits`, re-seeded per (step, 8-row global granule) for
cross-band consistency, using cheap weak-order-1 laws
(`sde.increment_dist`) whose generation measured 2.1x Box-Muller on the VPU
(scripts/experiment_sde_noise.py).

Usage: python scripts/experiment_sde_fused.py [n=4096] [steps=2000]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000


def run(label: str, eq_factory, *, dist="normal", kernel_noise="auto",
        disable_fused=False, force_fused=False):
    import jax.numpy as jnp

    import pde_tpu as pde
    from pde_tpu.solvers.euler import EulerSolver

    os.environ.pop("PDE_TPU_DISABLE_FUSED", None)
    os.environ.pop("PDE_TPU_FUSED_SDE", None)
    if disable_fused:
        os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
    if force_fused:
        os.environ["PDE_TPU_FUSED_SDE"] = "1"
    grid = pde.UnitGrid([N, N], periodic=True)
    state = pde.ScalarField(grid, 0.0)
    dt = 1e-5
    with pde.config(
        {"sde.increment_dist": dist, "sde.kernel_noise": kernel_noise}
    ):
        eq = eq_factory(pde)
        solver = EulerSolver(eq, backend="jax")
        stepper = solver.make_stepper(state, dt=dt)
        out, _ = stepper(state, 0.0, 64 * dt)  # compile
        float(jnp.sum(out.data))
        t0 = time.perf_counter()
        out, _ = stepper(state, 0.0, STEPS * dt)
        float(jnp.sum(out.data))
        wall = time.perf_counter() - t0
    rate = N * N * STEPS / wall
    fused = solver.info.get("fused_step", False)
    var = float(jnp.var(out.data))
    print(
        f"{label:34s}: {rate:.3e} updates/s  fused={fused} var={var:.5f}",
        flush=True,
    )


def main():
    print(f"n={N} steps={STEPS}")
    diff = lambda pde: pde.DiffusionPDE(diffusivity=0.1, noise=1.0)
    kpz = lambda pde: pde.KPZInterfacePDE(nu=1.0, lmbda=1.0, noise=0.1)
    for name, factory in (("diffusion", diff), ("kpz", kpz)):
        run(f"{name} XLA normal", factory, disable_fused=True)
        run(f"{name} fused ext-noise (r2 design)", factory, force_fused=True,
            kernel_noise="off")
        run(f"{name} fused kernel irwin4", factory, dist="irwin4")
        run(f"{name} fused kernel rademacher", factory, dist="rademacher")
        run(f"{name} fused kernel box-muller", factory, kernel_noise="on")


if __name__ == "__main__":
    main()
