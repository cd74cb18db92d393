"""Experiment 2: roll-free kernel with IN-VMEM column wrap (no HBM pad).

Rows wrap via the baseline's wraparound DMAs; columns wrap by concatenating
k lanes of each edge INSIDE VMEM once per k-step block, then every step
uses shifted value slices (no `pltpu.roll`, so bf16 is legal). If bf16
doubles the VPU lanes, this should beat the f32 roll baseline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import pde_tpu as pde

N = 4096
STEPS = 2048
A, B = 1.0, 1e-9
base = np.random.default_rng(0).random((N, N)).astype(np.float32)


def make_kernel(dtype, k, band):
    halo = -(-k // 8) * 8
    n_rows = n_cols = N

    def kernel(f_hbm, out_ref, band_ref, halo_top, halo_bot, sem):
        i = pl.program_id(0)
        row0 = i * band
        main = pltpu.make_async_copy(
            f_hbm.at[pl.ds(pl.multiple_of(row0, 8), band), :], band_ref, sem.at[0])
        main.start()
        top_row = pl.multiple_of(jax.lax.rem(row0 + np.int32(n_rows - halo), np.int32(n_rows)), 8)
        top = pltpu.make_async_copy(f_hbm.at[pl.ds(top_row, halo), :], halo_top, sem.at[1])
        top.start()
        bot_row = pl.multiple_of(jax.lax.rem(row0 + np.int32(band), np.int32(n_rows)), 8)
        bot = pltpu.make_async_copy(f_hbm.at[pl.ds(bot_row, halo), :], halo_bot, sem.at[2])
        bot.start()
        main.wait(); top.wait(); bot.wait()
        work = jnp.concatenate(
            [halo_top[halo - k:, :], band_ref[:, :], halo_bot[:k, :]], axis=0)
        # in-VMEM column wrap: k lanes from each edge
        work = jnp.concatenate(
            [work[:, n_cols - k:], work, work[:, :k]], axis=1)
        for s in range(k):
            up = work[:-2, 1:-1]
            center = work[1:-1, 1:-1]
            down = work[2:, 1:-1]
            left = work[1:-1, :-2]
            right = work[1:-1, 2:]
            lap4 = up + down + left + right - 4.0 * center
            work = A * center + B * lap4
        out_ref[:, :] = work

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, N), dtype),
        grid=(N // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band, N), dtype),
            pltpu.VMEM((halo, N), dtype),
            pltpu.VMEM((halo, N), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )


def timed(run, data):
    out = run(data)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t0 = time.perf_counter()
    out = run(data)
    s = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t1 = time.perf_counter()
    return N * N * STEPS / (t1 - t0), s


for name, dtype, k, band in (
    ("f32  vmem-wrap k=8  band=128", jnp.float32, 8, 128),
    ("f32  vmem-wrap k=16 band=128", jnp.float32, 16, 128),
    ("bf16 vmem-wrap k=8  band=128", jnp.bfloat16, 8, 128),
    ("bf16 vmem-wrap k=16 band=128", jnp.bfloat16, 16, 128),
    ("bf16 vmem-wrap k=16 band=256", jnp.bfloat16, 16, 256),
):
    try:
        call = make_kernel(dtype, k, band)
        run = jax.jit(lambda d, _c=call, _k=k: jax.lax.fori_loop(
            0, STEPS // _k, lambda i, x: _c(x), d))
        rate, s = timed(run, jnp.asarray(base, dtype))
        print(f"{name}: {rate:.3e} cell-updates/s (sum={s:.1f})")
    except Exception as err:
        print(f"{name}: FAILED {type(err).__name__}: {str(err)[:200]}")
