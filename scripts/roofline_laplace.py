"""Roofline sweep of the fused diffusion kernel on the real TPU.

Measures cell-update throughput for the XLA path and the fused Pallas kernel
across temporal-blocking factors k and dtypes, and reports the implied HBM
bandwidth and VPU utilisation so the binding resource is explicit
(docs/BENCHMARKS.md "Roofline" section).

Run on one chip (`python scripts/roofline_laplace.py`), never concurrently
with another TPU process (the axon tunnel serializes).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import pde_tpu as pde
from pde_tpu.ops.pallas_cartesian import _pick_band, make_affine_laplace_2d

SIZE = 4096
STEPS = 2048  # per timed window
DT_D = 0.1 * 0.1  # dt * diffusivity


def _measure(step_fn, data, k: int, repeats: int = 2) -> float:
    """Cell-updates/s of `step_fn` advancing k steps per call."""
    calls = max(1, STEPS // k)

    @jax.jit
    def window(x):
        return jax.lax.fori_loop(0, calls, lambda i, d: step_fn(d), x)

    x = window(data)
    float(jnp.sum(x))  # force completion (block_until_ready unreliable on axon)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = window(x)
        float(jnp.sum(x))
        el = time.perf_counter() - t0
        best = max(best, SIZE * SIZE * calls * k / el)
    return best


def main() -> None:
    grid = pde.UnitGrid([SIZE, SIZE], periodic=True)
    rng = np.random.default_rng(0)
    base = rng.random((SIZE, SIZE))

    print(f"# {SIZE}^2 periodic diffusion, one step = a*f + b*lap(f)")
    print("# config, Gupdates/s, HBM GB/s (implied), VPU Gflop/s (8 flops/upd)")

    # XLA path
    lap = grid.make_operator("laplace", bc="periodic")
    data32 = jnp.asarray(base, dtype=jnp.float32)

    def xla_step(d):
        return d + DT_D * lap(d)

    rate = _measure(xla_step, data32, k=1)
    print(f"xla fp32: {rate/1e9:8.1f}  {rate*5*4/1e9:8.0f}  {rate*8/1e9:8.0f}")

    for dtype, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        data = jnp.asarray(base, dtype=dtype)
        itemsize = jnp.dtype(dtype).itemsize
        for k in (4, 8, 16):
            try:
                step = make_affine_laplace_2d(
                    grid, a=1.0, b=DT_D, k=k, dtype=dtype
                )
                rate = _measure(step, data, k=k)
            except Exception as err:  # noqa: BLE001 — report and continue
                print(f"pallas {name} k={k:2d}: failed ({type(err).__name__})")
                continue
            band = _pick_band(SIZE, SIZE, itemsize, k)
            halo = -(-k // 8) * 8
            # bytes per cell-update: (band + 2*halo read + band written) per k steps
            bytes_per_update = (2 * band + 2 * halo) * itemsize / (band * k)
            hbm = rate * bytes_per_update / 1e9
            print(
                f"pallas {name} k={k:2d} band={band:3d}: {rate/1e9:8.1f}"
                f"  {hbm:8.0f}  {rate*8/1e9:8.0f}"
            )


if __name__ == "__main__":
    main()
