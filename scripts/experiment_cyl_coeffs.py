"""Experiment: cylindrical radial-term formulations (VERDICT round-3 #10).

The cylindrical kernel's update is `cu*up + cd*down + b*sy*(l+r) + c*center`
with TWO (rows,1)-broadcast multiplies per step (cu/cd fold the 1/r term).
Candidate: refactor to `b*sx*(up+down) + fac*(down-up) + ...` — ONE
broadcast multiply plus one extra add — and compare; also try hoisting the
coefficient arrays out of the kernel as a (rows, 128) side input (row-side
input, not the lane-broadcast round-2 negative).
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
from pde_tpu.ops.pallas_cartesian import make_fused_euler_window_2d

N = 2048
STEPS = 2000
D, DT = 0.1, 1e-9
grid = pde.CylindricalSymGrid(1.0, (0, 1), (N, N))
bcs = grid.get_boundary_conditions({"derivative": 0})
base = np.random.default_rng(0).random((N, N)).astype(np.float32)


def timed(run, data):
    out = run(data)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(data)
    s = float(jnp.sum(out))
    t1 = time.perf_counter()
    return N * N * STEPS / (t1 - t0), s


# baseline: the production kernel (folded cu/cd coefficients)
window = make_fused_euler_window_2d(
    grid, diffusivity=D, dt=DT, bcs=bcs, dtype=jnp.float32
)
run = jax.jit(lambda d: window(d, STEPS))
rate, s = timed(run, jnp.asarray(base, jnp.float32))
print(f"baseline folded cu/cd: {rate:.3e} cell-updates/s (sum={s:.1f})")


# variant: single broadcast multiply (fac*(down-up))
def make_variant(k=16, band=256):
    halo = -(-k // 8) * 8
    sx, sy = (1.0 / grid.discretization**2).tolist()
    r_lo = float(grid.axes_bounds[0][0])
    dr = float(grid.discretization[0])
    a, b = 1.0, DT * D
    (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = (
        (dr * 0.0, 1.0, 0.0), (dr * 0.0, 1.0, 0.0))  # no-flux virtual points
    n_rows = n_cols = N
    n_programs = n_rows // band

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
        rows_g = row0 - np.int32(k) + jax.lax.broadcasted_iota(
            jnp.int32, (band + 2 * k, 1), 0)
        r_vals = (rows_g.astype(jnp.float32) + 0.5) * dr + r_lo
        fac_full = (b / (2.0 * dr)) / r_vals
        bsx = b * sx
        bsy = b * sy
        c_center = a - 2.0 * b * sx - 2.0 * b * sy
        for s in range(k):
            # no-flux ghost rows at both radial edges
            e_lo = k - s
            ghost_lo = c_lo + f1_lo * work[e_lo:e_lo + 1, :]
            e_hi = band + k - s - 1
            ghost_hi = c_hi + f1_hi * work[e_hi:e_hi + 1, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
            work = jnp.where((rows == e_lo - 1) & (i == 0), ghost_lo, work)
            work = jnp.where((rows == e_hi + 1) & (i == n_programs - 1), ghost_hi, work)
            up = work[:-2, :]
            center = work[1:-1, :]
            down = work[2:, :]
            left = pltpu.roll(center, 1, 1)
            right = pltpu.roll(center, n_cols - 1, 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
            gl = c_lo + f1_lo * center
            gh = c_hi + f1_hi * center
            left = jnp.where(lanes == 0, gl, left)
            right = jnp.where(lanes == n_cols - 1, gh, right)
            sl = slice(s + 1, band + 2 * k - s - 1)
            work = (
                bsx * (up + down)
                + fac_full[sl] * (down - up)
                + bsy * (left + right)
                + c_center * center
            )
        out_ref[:, :] = work

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        grid=(N // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((band, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((band, N), jnp.float32),
            pltpu.VMEM((halo, N), jnp.float32),
            pltpu.VMEM((halo, N), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )


for k in (16,):
    call = make_variant(k=k)
    run = jax.jit(lambda d, _c=call, _k=k: jax.lax.fori_loop(
        0, STEPS // _k, lambda i, x: _c(x), d))
    rate, s = timed(run, jnp.asarray(base, jnp.float32))
    print(f"single-bcast fac*(down-up) k={k}: {rate:.3e} cell-updates/s (sum={s:.1f})")
