"""Compare different solvers on the same problem.

Mirrors `/root/reference/examples/advanced_pdes/solver_comparison.py`.
"""

import time

import numpy as np

import pde_tpu as pde

grid = pde.UnitGrid([32, 32], periodic=True)
state = pde.ScalarField.random_uniform(grid, rng=np.random.default_rng(0))
eq = pde.DiffusionPDE()

reference = eq.solve(state, t_range=1, dt=1e-4, solver="runge-kutta", tracker=None)

for solver, kwargs in [
    ("euler", {"dt": 1e-3}),
    ("euler", {"adaptive": True, "tolerance": 1e-5}),
    ("runge-kutta", {"adaptive": True, "tolerance": 1e-8}),
    ("implicit", {"dt": 1e-3}),
    ("crank-nicolson", {"dt": 1e-3}),
    ("scipy", {}),
]:
    start = time.perf_counter()
    result, info = eq.solve(state, t_range=1, solver=solver, tracker=None,
                            ret_info=True, **kwargs)
    duration = time.perf_counter() - start
    error = float(abs(result.data - reference.data).max())
    print(f"{solver:15s} {kwargs!s:40s} {duration:6.2f}s  error={error:.2e}  "
          f"steps={info['solver']['steps']}")
