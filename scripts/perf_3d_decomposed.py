"""256^3 no-flux diffusion: decomposed ext-y-chunk vs serial vs XLA.

Modes: decomp | serial | xla (docs/BENCHMARKS.md round-5: 6.72e10 /
7.04e10 / 1.33e10; one chip can only run a [1,1,1] mesh).

    timeout 900 python scripts/perf_3d_decomposed.py decomp
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
from pde_tpu.solvers.controller import Controller
from pde_tpu.solvers.euler import EulerSolver

N = 256
STEPS = 2048
mode = sys.argv[1]  # "decomp" | "serial" | "xla"
grid = pde.CartesianGrid([(0, 1)] * 3, (N, N, N))
state = pde.ScalarField.random_uniform(
    grid, rng=np.random.default_rng(0), dtype=jnp.float32
)
eq = pde.DiffusionPDE(0.1, bc={"derivative": 0})
dt = 1e-7
if mode == "xla":
    os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
kw = {"decomposition": [1, 1, 1]} if mode == "decomp" else {}
solver = EulerSolver(eq, **kw)
stepper = solver.make_stepper(state, dt=dt)
out, t = stepper(state, 0.0, dt * 64)
np.asarray(out.data)
print(mode, "fused:", solver.info.get("fused_step"),
      "unsup:", solver.info.get("fused_unsupported"), flush=True)
t0 = time.perf_counter()
out, t = stepper(out, t, t + dt * STEPS)
float(jnp.sum(out.data))
el = time.perf_counter() - t0
print(f"256^3 no-flux {mode}: {N**3*STEPS/el:.4g} cell-updates/s "
      f"({el:.2f}s)", flush=True)
