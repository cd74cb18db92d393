"""Experiment: lane-direction stencil via MXU banded matmuls.

The roll-based kernel pays ~2-3x relayout vector ops for the lane shifts.
Alternative: express `left + right` as a banded-matrix product — per 128-lane
tile j, `X_{j-1} @ U + X_j @ T + X_{j+1} @ L` with T = tridiag(1,0,1) inside
the tile and U/L one-hot corner matrices — so the MXU does the shifts. The
sublane (row) direction stays on the VPU (shifted slices are cheap there).
Measures the full diffusion step both ways at 4096^2 f32/bf16.
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

N = 4096
STEPS = 1024
A, B = 1.0, 1e-9
TILE = 128
NT = N // TILE
base = np.random.default_rng(0).random((N, N)).astype(np.float32)


def make_kernel(dtype, k, band, mode):
    halo = -(-k // 8) * 8
    n_rows = n_cols = N

    # banded tile matrices (periodic wrap handled by tile neighbors mod NT)
    T0 = np.zeros((TILE, TILE), np.float32)
    for i in range(TILE - 1):
        T0[i + 1, i] = 1.0  # right neighbor contribution
        T0[i, i + 1] = 1.0  # left neighbor contribution
    U = np.zeros((TILE, TILE), np.float32); U[TILE - 1, 0] = 1.0
    L = np.zeros((TILE, TILE), np.float32); L[0, TILE - 1] = 1.0
    mats_np = [np.asarray(m, dtype) for m in (T0, U, L)]

    def kernel(f_hbm, t_ref, u_ref, l_ref, out_ref, band_ref, halo_top, halo_bot, sem):
        T0j = t_ref[:, :]
        Uj = u_ref[:, :]
        Lj = l_ref[:, :]
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
        for s in range(k):
            up = work[:-2, :]
            center = work[1:-1, :]
            down = work[2:, :]
            if mode == "roll":
                left = pltpu.roll(center, 1, 1)
                right = pltpu.roll(center, n_cols - 1, 1)
                lr = left + right
            else:
                # per-tile banded matmuls: lr_j = C_{j-1}@U + C_j@T + C_{j+1}@L
                tiles = [center[:, j * TILE:(j + 1) * TILE] for j in range(NT)]
                lr_tiles = []
                for j in range(NT):
                    _prec = (jax.lax.Precision.HIGHEST
                             if mode == "mxu_exact" else None)
                    acc = jnp.dot(tiles[j], T0j, precision=_prec,
                                  preferred_element_type=jnp.float32)
                    acc = acc + jnp.dot(tiles[(j - 1) % NT], Uj, precision=_prec,
                                        preferred_element_type=jnp.float32)
                    acc = acc + jnp.dot(tiles[(j + 1) % NT], Lj, precision=_prec,
                                        preferred_element_type=jnp.float32)
                    lr_tiles.append(acc.astype(center.dtype))
                lr = jnp.concatenate(lr_tiles, axis=1)
            lap4 = up + down + lr - 4.0 * center
            work = A * center + B * lap4
        out_ref[:, :] = work

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, N), dtype),
        grid=(N // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((TILE, TILE), lambda i: (0, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((band, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band, N), dtype),
            pltpu.VMEM((halo, N), dtype),
            pltpu.VMEM((halo, N), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return call, [jnp.asarray(m) for m in mats_np]


def timed(run, data):
    out = run(data)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t0 = time.perf_counter()
    out = run(data)
    s = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t1 = time.perf_counter()
    return N * N * STEPS / (t1 - t0), s


import sys as _sys

CONFIGS = {
    "base": (
        ("f32  roll k=8", jnp.float32, 8, 128, "roll"),
        ("f32  MXU  k=8", jnp.float32, 8, 128, "mxu"),
        ("bf16 MXU  k=8", jnp.bfloat16, 8, 128, "mxu"),
    ),
    "exact": (
        ("f32 roll      k=16", jnp.float32, 16, 128, "roll"),
        ("f32 MXU exact k=16", jnp.float32, 16, 128, "mxu_exact"),
        ("f32 MXU exact k=8 ", jnp.float32, 8, 128, "mxu_exact"),
    ),
    "k16": (
        ("f32  roll k=16", jnp.float32, 16, 128, "roll"),
        ("f32  MXU  k=16", jnp.float32, 16, 128, "mxu"),
        ("bf16 MXU  k=16", jnp.bfloat16, 16, 128, "mxu"),
        ("bf16 MXU  k=16 band=256", jnp.bfloat16, 16, 256, "mxu"),
    ),
}

for name, dtype, k, band, mode in CONFIGS.get(
    _sys.argv[1] if len(_sys.argv) > 1 else "base", CONFIGS["base"]
):
    try:
        call, mats = make_kernel(dtype, k, band, mode)
        run = jax.jit(lambda d, _c=call, _m=mats, _k=k: jax.lax.fori_loop(
            0, STEPS // _k, lambda i, x: _c(x, *_m), d))
        rate, s = timed(run, jnp.asarray(base, dtype))
        print(f"{name}: {rate:.3e} cell-updates/s (sum={s:.1f})")
    except Exception as err:
        print(f"{name}: FAILED {type(err).__name__}: {str(err)[:200]}")
