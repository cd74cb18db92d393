"""Measure the production 3D fused path at 256^3 (y-chunked vs roll vs XLA).

The y-chunked kernel (ops/pallas_cartesian._make_ychunk_multi_window_3d)
auto-engages once a (y, z) plane exceeds 96 KB; forcing `_pick_ychunk_3d`
to refuse reproduces the previous plane-resident roll-path number. Both the
plain-diffusion route (make_fused_euler_window_3d) and the expression-
compiler route (Allen-Cahn through make_chunked_multi_window_3d) are
measured. State stays device-resident across windows. Run on the real chip:

    timeout 3000 python scripts/perf_3d.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax.numpy as jnp  # noqa: E402

import pde_tpu as pde  # noqa: E402
import pde_tpu.ops.pallas_cartesian as pc  # noqa: E402
from pde_tpu.solvers.euler import EulerSolver  # noqa: E402

N = 256
STEPS = 2048
WINDOWS = 3
DT = 0.05

rng = np.random.default_rng(0)
grid = pde.UnitGrid([N, N, N], periodic=True)
state = pde.ScalarField(
    grid, rng.uniform(-0.1, 0.1, size=(N, N, N)).astype(np.float32)
)

EQS = {
    "diffusion": pde.DiffusionPDE(1.0),
    "allen-cahn": pde.PDE({"u": "laplace(u) + u - u**3"}),
}


def measure(eq, disable_fused=False, disable_ychunk=False):
    if disable_fused:
        os.environ["PDE_TPU_DISABLE_FUSED"] = "1"
    else:
        os.environ.pop("PDE_TPU_DISABLE_FUSED", None)
    orig_pick = pc._pick_ychunk_3d
    if disable_ychunk:
        pc._pick_ychunk_3d = lambda *a, **kw: None
    try:
        solver = EulerSolver(eq)
        stepper = solver.make_stepper(state, dt=DT)
        out, t = stepper(state, 0.0, STEPS * DT)  # warmup/compile + upload
        np.asarray(out.data)
        t0 = time.perf_counter()
        for _ in range(WINDOWS):
            out, t = stepper(out, t, t + STEPS * DT)
        float(jnp.sum(out.data))  # force completion
        el = time.perf_counter() - t0
    finally:
        pc._pick_ychunk_3d = orig_pick
    rate = N * N * N * STEPS * WINDOWS / el
    print(
        f"fused={solver.info.get('fused_step')} "
        f"{rate:.4g} cell-updates/s ({el:.2f}s for {STEPS * WINDOWS} steps)",
        flush=True,
    )
    return rate


for name, eq in EQS.items():
    print(f"== {name} 256^3: fused (y-chunked) ==", flush=True)
    r_yc = measure(eq)
    print(f"== {name} 256^3: fused (roll path) ==", flush=True)
    r_roll = measure(eq, disable_ychunk=True)
    print(f"== {name} 256^3: XLA ==", flush=True)
    r_xla = measure(eq, disable_fused=True)
    print(
        f"{name}: ychunk/roll {r_yc / r_roll:.2f}x, "
        f"ychunk/XLA {r_yc / r_xla:.2f}x",
        flush=True,
    )
