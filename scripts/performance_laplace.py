#!/usr/bin/env python3
"""Benchmark the 2D Laplace operator against other implementations.

Port of the reference comparison harness
(`/root/reference/scripts/performance_laplace.py`): times our fused operator
(jnp lowering and, on TPU, the Pallas kernel) against plain numpy/scipy
implementations over a range of grid sizes, for periodic and no-flux BCs.

Note: single-operator calls over the remote TPU tunnel are dominated by the
~2 ms per-call dispatch floor; sustained throughput (what solvers see inside
their compiled window loops) is measured by bench.py instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import json
import time

import numpy as np


def _sync(result) -> None:
    """Force completion without a full device->host transfer."""
    try:
        import jax.numpy as jnp

        float(jnp.sum(result))
    except TypeError:
        np.asarray(result)


def time_function(func, arg, repetitions: int = 20) -> float:
    _sync(func(arg))  # warm up / compile
    start = time.perf_counter()
    for _ in range(repetitions):
        result = func(arg)
    # device work is queued asynchronously; syncing the last result waits
    # for the whole serially-executed queue
    _sync(result)
    return (time.perf_counter() - start) / repetitions


def numpy_laplace_periodic(arr):
    return (
        np.roll(arr, 1, 0) + np.roll(arr, -1, 0)
        + np.roll(arr, 1, 1) + np.roll(arr, -1, 1) - 4 * arr
    )


def scipy_laplace_periodic(arr):
    from scipy import ndimage

    return ndimage.laplace(arr, mode="wrap")


def main() -> None:
    import jax.numpy as jnp

    import pde_tpu as pde

    results = {}
    for size in (64, 256, 1024, 4096):
        shape = (size, size)
        data = np.random.random(shape)
        entry = {}

        # our operator, periodic
        grid = pde.UnitGrid(shape, periodic=True)
        op = grid.make_operator("laplace", bc="periodic")
        jdata = jnp.asarray(data, dtype=jnp.float32)
        entry["pde_tpu periodic"] = time_function(op, jdata)

        # our operator, no-flux
        grid_nf = pde.UnitGrid(shape)
        op_nf = grid_nf.make_operator("laplace", bc={"derivative": 0})
        entry["pde_tpu no-flux"] = time_function(op_nf, jdata)

        # fused Pallas kernel where supported
        try:
            from pde_tpu.ops.pallas_cartesian import make_laplace_pallas

            op_pallas = make_laplace_pallas(grid)
            entry["pde_tpu pallas"] = time_function(op_pallas, jdata)
        except NotImplementedError:
            pass

        # reference implementations (host)
        if size <= 1024:
            entry["numpy periodic"] = time_function(numpy_laplace_periodic, data)
            entry["scipy periodic"] = time_function(scipy_laplace_periodic, data)
            try:  # torch CPU conv (the reference compares against torch too)
                import torch

                kernel = torch.tensor(
                    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]
                ).reshape(1, 1, 3, 3)
                tdata = torch.from_numpy(data).reshape(1, 1, size, size).float()

                def torch_laplace_periodic(arr):
                    padded = torch.nn.functional.pad(
                        arr, (1, 1, 1, 1), mode="circular"
                    )
                    return torch.nn.functional.conv2d(padded, kernel)

                entry["torch periodic"] = time_function(
                    torch_laplace_periodic, tdata
                )
            except ImportError:
                pass

        results[size] = entry
        line = "  ".join(f"{k}: {v*1e3:8.3f} ms" for k, v in entry.items())
        print(f"{size:5d}²  {line}")

    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
