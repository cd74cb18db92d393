"""Fused fixed-dt Adams-Bashforth (4096^2 diffusion): fused vs XLA.

Run fused, then PDE_TPU_DISABLE_FUSED=1 for the XLA number
(docs/BENCHMARKS.md round-5: 7.30e10 vs 1.50e10, 4.9x).

    timeout 900 python scripts/perf_ab2.py
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
from pde_tpu.solvers.adams_bashforth import AdamsBashforthSolver

N = 4096
STEPS = 4096
disable = os.environ.get("PDE_TPU_DISABLE_FUSED") == "1"
grid = pde.UnitGrid([N, N], periodic=True)
state = pde.ScalarField.random_uniform(
    grid, rng=np.random.default_rng(0), dtype=jnp.float32
)
eq = pde.DiffusionPDE(0.1)
dt = 0.1
solver = AdamsBashforthSolver(eq)
stepper = solver.make_stepper(state, dt=dt)
out, t = stepper(state, 0.0, dt * 64)
np.asarray(out.data)
print("fused:", solver.info.get("fused_step"),
      "unsup:", solver.info.get("fused_unsupported"), flush=True)
t0 = time.perf_counter()
out, t = stepper(out, t, t + dt * STEPS)
float(jnp.sum(out.data))
el = time.perf_counter() - t0
print(f"diffusion AB2 {'XLA' if disable else 'fused'}: "
      f"{N*N*STEPS/el:.4g} cell-updates/s ({el:.2f}s)", flush=True)
