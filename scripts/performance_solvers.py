#!/usr/bin/env python3
"""Benchmark PDE solver throughput (Cahn-Hilliard), mirroring
`/root/reference/scripts/performance_solvers.py` and the BASELINE config
"Cahn-Hilliard 1024² to t=100".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import json
import os
import time

import numpy as np

def main() -> None:
    import jax.numpy as jnp

    import pde_tpu as pde

    size = int(os.environ.get("CH_SIZE", "1024"))
    t_end = float(os.environ.get("CH_T_END", "100"))
    dt = float(os.environ.get("CH_DT", "0.001"))

    grid = pde.UnitGrid([size, size], periodic=True)
    state = pde.ScalarField.random_uniform(
        grid, -0.1, 0.1, rng=np.random.default_rng(0), dtype=jnp.float32
    )
    eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})

    solver = pde.solvers.EulerSolver(eq, adaptive=False)
    stepper = solver.make_stepper(state, dt=dt)

    # compile + warm up with a short window
    s, t = stepper(state, 0.0, 100 * dt)
    np.asarray(s.data)

    start = time.perf_counter()
    s, t = stepper(s, t, t_end)
    float(jnp.sum(s.data))  # force completion
    elapsed = time.perf_counter() - start
    steps = solver.info["steps"] - 100

    print(
        json.dumps(
            {
                "metric": f"Cahn-Hilliard {size}^2 to t={t_end}",
                "value": elapsed,
                "unit": "seconds",
                "steps": steps,
                "cell_updates_per_s": size * size * steps / elapsed,
            }
        )
    )


if __name__ == "__main__":
    main()
