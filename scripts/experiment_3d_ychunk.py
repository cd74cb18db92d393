"""Prototype: y-chunked 3D fused laplace kernel at 256^3.

Finding from experiment_rk4_kernel-era probes: at k=2 the 3D kernel reaches
1.0e11 updates/s when the (y,z) plane is 96 KB but only 7.2e10 at 256 KB —
the lever at 256^3 is SMALLER working planes, not larger k. This prototype
adds a second pallas-grid dim over y chunks (halo-extended y, shifted-slice
neighbors instead of sublane rolls) and measures it against the production
kernel. Periodic BCs only (the integration into make_affine_laplace_3d adds
the ghost-fixup machinery).
"""
import time
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 256
A, B = 1.0, 1e-5


def make_ychunk_laplace(shape, band, ny_c, k, dtype=np.float32,
                        vmem_mb=None):
    nx, ny, nz = shape
    assert nx % band == 0 and ny % ny_c == 0
    yh = -(-k // 8) * 8  # y halo rounded to the sublane granule
    sx = 1.0

    def kernel(f_hbm, out_ref, blk, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = i * band
        y0 = j * ny_c
        # 9 DMAs: 3 x-regions x 3 y-regions of the halo-extended block
        copies = []
        xs = [
            (jax.lax.rem(x0 + np.int32(nx - k), np.int32(nx)), k, 0),
            (pl.multiple_of(x0, 8), band, k),
            (jax.lax.rem(x0 + np.int32(band), np.int32(nx)), k, k + band),
        ]
        ys = [
            (pl.multiple_of(
                jax.lax.rem(y0 + np.int32(ny - yh), np.int32(ny)), 8
            ), yh, 0),
            (pl.multiple_of(y0, 8), ny_c, yh),
            (pl.multiple_of(
                jax.lax.rem(y0 + np.int32(ny_c), np.int32(ny)), 8
            ), yh, yh + ny_c),
        ]
        for xg, xl, xd in xs:
            for yg, yl, yd in ys:
                cp = pltpu.make_async_copy(
                    f_hbm.at[pl.ds(xg, xl), pl.ds(yg, yl), :],
                    blk.at[pl.ds(xd, xl), pl.ds(yd, yl), :],
                    sem.at[len(copies)],
                )
                cp.start()
                copies.append(cp)
        for cp in copies:
            cp.wait()

        work = blk[:, :, :]
        for s in range(k):
            up = work[:-2, 1:-1, :]
            center = work[1:-1, 1:-1, :]
            down = work[2:, 1:-1, :]
            north = work[1:-1, :-2, :]
            south = work[1:-1, 2:, :]
            west = pltpu.roll(center, 1, 2)
            east = pltpu.roll(center, nz - 1, 2)
            lap6 = up + down + north + south + west + east - 6.0 * center
            work = A * center + (B * sx) * lap6
        out_ref[:, :, :] = work[:, yh - k : yh - k + ny_c, :]

    params = (
        {} if vmem_mb is None else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024
            )
        }
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        grid=(nx // band, ny // ny_c),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (band, ny_c, nz), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band + 2 * k, ny_c + 2 * yh, nz), dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        **params,
    )
    return call


def measure(label, win, k, shape):
    data = jnp.asarray(
        np.random.default_rng(0).uniform(size=shape).astype(np.float32)
    )

    @jax.jit
    def run_n(d, n):
        return jax.lax.fori_loop(0, n, lambda i, x: win(x), d)

    out = run_n(data, 2)
    float(jnp.sum(out))
    calls = 2048 // k
    t0 = time.perf_counter()
    out = run_n(data, calls)
    float(jnp.sum(out))
    el = time.perf_counter() - t0
    n = shape[0] * shape[1] * shape[2]
    print(f"{label}: {n * k * calls / el:.4g} updates/s ({el:.2f}s)",
          flush=True)


shape = (N, N, N)
for band, ny_c, k, mb in [
    (32, 128, 8, 64), (32, 128, 16, 100), (16, 128, 16, 100),
    (64, 128, 8, 100), (16, 64, 16, 64), (32, 64, 16, 64),
    (16, 128, 8, 64),
]:
    try:
        win = make_ychunk_laplace(shape, band, ny_c, k, vmem_mb=mb)
        measure(f"ychunk band={band} ny_c={ny_c} k={k} vmem={mb}M",
                win, k, shape)
    except Exception as e:
        print(f"band={band} ny_c={ny_c} k={k} vmem={mb}M failed: "
              f"{type(e).__name__}", flush=True)
