"""Hardware check: 3D xt BC fusion engages + 9-pt corner fused parity/perf."""
import time

import numpy as np

import pde_tpu as pde
from pde_tpu.solvers.euler import EulerSolver

rng = np.random.default_rng(0)

# --- 1. the 3D space-time BC config from the failing tpu test ---
grid = pde.CartesianGrid([(0, 1)] * 3, (64, 64, 128))
state = pde.ScalarField(grid, rng.uniform(size=(64, 64, 128)).astype(np.float32))
bc = {"x": {"derivative": 0},
      "y-": {"value_expression": "sin(z - 2 * t)"},
      "y+": {"derivative": 0},
      "z-": {"value_expression": "cos(x + t)"}, "z+": {"derivative": 0}}
eq = pde.DiffusionPDE(0.05, bc=bc)
solver = EulerSolver(eq)
res, _ = solver.make_stepper(state, dt=1e-3)(state, 0.0, 0.2)
print("3D xt fused_step:", solver.info.get("fused_step"), flush=True)

import os
os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
ref = eq.solve(state, t_range=0.2, dt=1e-3, tracker=None)
del os.environ["PDE_TPU_DISABLE_FUSED"]
print("3D xt maxdiff:", float(np.max(np.abs(np.asarray(res.data) - np.asarray(ref.data)))), flush=True)

# --- 2. 9-point corner-weight fused: parity + perf ---
grid2 = pde.UnitGrid([256, 256], periodic=True)
state2 = pde.ScalarField(grid2, rng.uniform(size=(256, 256)).astype(np.float32))
with pde.config({"operators.cartesian.laplacian_2d_corner_weight": 1 / 3}):
    eq2 = pde.DiffusionPDE(0.5)
    s9 = EulerSolver(eq2)
    out9, _ = s9.make_stepper(state2, dt=1e-3)(state2, 0.0, 1.0)
    print("9pt fused_step:", s9.info.get("fused_step"), flush=True)
    os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
    ref9 = eq2.solve(state2, t_range=1.0, dt=1e-3, tracker=None)
    del os.environ["PDE_TPU_DISABLE_FUSED"]
    print("9pt maxdiff:", float(np.max(np.abs(np.asarray(out9.data) - np.asarray(ref9.data)))), flush=True)

    # perf at 4096^2
    big = pde.UnitGrid([4096, 4096], periodic=True)
    bstate = pde.ScalarField(big, rng.uniform(size=(4096, 4096)).astype(np.float32))
    sb = EulerSolver(eq2)
    stepper = sb.make_stepper(bstate, dt=1e-5)
    r, _ = stepper(bstate, 0.0, 0.02)  # 2000 steps warmup/compile
    float(np.sum(np.asarray(r.data)))
    t0 = time.time()
    steps = 16000
    r, _ = stepper(bstate, 0.0, steps * 1e-5)
    float(np.sum(np.asarray(r.data)))
    el = time.time() - t0
    print("9pt fused updates/s:", 4096 * 4096 * steps / el, flush=True)
    print("9pt fused_step big:", sb.info.get("fused_step"), flush=True)

    os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
    sx = EulerSolver(eq2)
    stepx = sx.make_stepper(bstate, dt=1e-5)
    r, _ = stepx(bstate, 0.0, 0.02)
    float(np.sum(np.asarray(r.data)))
    t0 = time.time()
    r, _ = stepx(bstate, 0.0, steps * 1e-5)
    float(np.sum(np.asarray(r.data)))
    el = time.time() - t0
    del os.environ["PDE_TPU_DISABLE_FUSED"]
    print("9pt XLA updates/s:", 4096 * 4096 * steps / el, flush=True)
