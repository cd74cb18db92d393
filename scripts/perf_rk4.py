"""Measure the fused fixed-dt RK4 window vs the XLA RK4 stepper.

Headline config: 2D diffusion 4096^2 f32, fully periodic (the same grid as
bench.py's Euler number). State stays device-resident across windows
(passing a host-backed field per call would re-upload 64 MB over the axon
tunnel and dominate the measurement). Run on the real chip:

    timeout 1800 python scripts/perf_rk4.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp  # noqa: E402

import pde_tpu as pde  # noqa: E402
from pde_tpu.solvers.runge_kutta import RungeKuttaSolver  # noqa: E402

N = 4096
STEPS = 4096
WINDOWS = 3
DT = 1e-5

rng = np.random.default_rng(0)
grid = pde.UnitGrid([N, N], periodic=True)
state = pde.ScalarField(grid, rng.uniform(size=(N, N)).astype(np.float32))
eq = pde.DiffusionPDE(0.5)


def measure(disable_fused):
    if disable_fused:
        os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
    else:
        os.environ.pop("PDE_TPU_DISABLE_FUSED", None)
    solver = RungeKuttaSolver(eq, adaptive=False)
    stepper = solver.make_stepper(state, dt=DT)
    out, t = stepper(state, 0.0, STEPS * DT)  # warmup/compile + upload
    np.asarray(out.data)
    t0 = time.perf_counter()
    for _ in range(WINDOWS):
        out, t = stepper(out, t, t + STEPS * DT)
    float(jnp.sum(out.data))  # force completion
    el = time.perf_counter() - t0
    rate = N * N * STEPS * WINDOWS / el
    print(
        f"fused={solver.info.get('fused_step')} "
        f"{rate:.4g} cell-updates/s ({el:.2f}s for {STEPS * WINDOWS} steps)",
        flush=True,
    )
    return rate


print("== RK4 fused ==", flush=True)
r_fused = measure(False)
print("== RK4 XLA ==", flush=True)
r_xla = measure(True)
print(f"speedup: {r_fused / r_xla:.2f}x", flush=True)
