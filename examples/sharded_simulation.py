"""Multi-device simulation via shard_map domain decomposition.

Run with multiple devices, e.g.
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu python
examples/sharded_simulation.py`` or on a TPU pod slice.
"""

import jax

import pde_tpu as pde

grid = pde.UnitGrid([64, 64], periodic=True)
state = pde.ScalarField.random_uniform(grid)

eq = pde.PDE({"c": "laplace(c**3 - c - laplace(c))"})
result = eq.solve(
    state, t_range=1, dt=0.01, solver="explicit_sharded",
    adaptive=False, decomposition="auto",
)
print("devices used:", len(jax.devices()))
print("final fluctuation:", float(result.fluctuations))
