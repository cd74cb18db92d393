"""Depth-2 fused RK4 (Cahn-Hilliard 2048^2): fused vs XLA.

Run fused, then PDE_TPU_DISABLE_FUSED=1 for the XLA number
(docs/BENCHMARKS.md round-5: 1.879e10 vs 8.44e9, 2.23x).

    timeout 900 python scripts/perf_rk4_depth2.py
"""
import os
import sys
import time

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import pde_tpu as pde
from pde_tpu.solvers.runge_kutta import RungeKuttaSolver

N = 2048
STEPS = 4096
disable = os.environ.get("PDE_TPU_DISABLE_FUSED") == "1"
grid = pde.UnitGrid([N, N], periodic=True)
state = pde.ScalarField.random_uniform(
    grid, -0.1, 0.1, rng=np.random.default_rng(0), dtype=jnp.float32
)
eq = pde.CahnHilliardPDE(interface_width=1.0)
dt = 1e-3
solver = RungeKuttaSolver(eq, adaptive=False)
stepper = solver.make_stepper(state, dt=dt)
out, t = stepper(state, 0.0, dt * 64)
np.asarray(out.data)
print("fused:", solver.info.get("fused_step"),
      "unsup:", solver.info.get("fused_unsupported"), flush=True)
t0 = time.perf_counter()
out, t = stepper(out, t, t + dt * STEPS)
float(jnp.sum(out.data))
el = time.perf_counter() - t0
print(f"CH RK4 {'XLA' if disable else 'fused'}: "
      f"{N*N*STEPS/el:.4g} cell-updates/s ({el:.2f}s)", flush=True)
