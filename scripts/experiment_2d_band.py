"""Prototype: larger row bands for the 2D kernel under a raised VMEM limit.

The production 2D kernel picks its band under the default 16 MB scoped-VMEM
limit (band=128 at 4096² f32 k=16), paying 2·halo/band = 25% redundant
stencil compute per program. The y-chunked 3D work (round 4) showed the
compiler accepts a 100 MB limit on v5e (128 MB physical); this prototype
replicates the periodic 5-point roll kernel at 4096² and measures whether
band 256/512 (halo overhead 12.5%/6.25%) or deeper k converts the saved
compute into throughput, or whether the kernel is DMA/occupancy-bound there.

    timeout 3000 python scripts/experiment_2d_band.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 4096
A, B = 1.0, 1e-5
SX = SY = 1.0


def make_kernel(band, k, vmem_mb=None):
    halo = -(-k // 8) * 8
    n_programs = N // band

    def kernel(f_hbm, out_ref, band_ref, halo_top, halo_bot, sem):
        i = pl.program_id(0)
        row0 = i * band
        main = pltpu.make_async_copy(
            f_hbm.at[pl.ds(pl.multiple_of(row0, 8), band), :], band_ref,
            sem.at[0],
        )
        main.start()
        top_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(N - halo), np.int32(N)), 8
        )
        top = pltpu.make_async_copy(
            f_hbm.at[pl.ds(top_row, halo), :], halo_top, sem.at[1]
        )
        top.start()
        bot_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(band), np.int32(N)), 8
        )
        bot = pltpu.make_async_copy(
            f_hbm.at[pl.ds(bot_row, halo), :], halo_bot, sem.at[2]
        )
        bot.start()
        main.wait(), top.wait(), bot.wait()
        work = jnp.concatenate(
            [halo_top[halo - k:, :], band_ref[:, :], halo_bot[:k, :]],
            axis=0,
        )
        for _ in range(k):
            up = work[:-2, :]
            center = work[1:-1, :]
            down = work[2:, :]
            left = pltpu.roll(center, 1, 1)
            right = pltpu.roll(center, N - 1, 1)
            lap = (
                SX * (up + down) + SY * (left + right)
                - (2.0 * (SX + SY)) * center
            )
            work = A * center + B * lap
        out_ref[:, :] = work

    params = {} if vmem_mb is None else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024
        )
    }
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        grid=(n_programs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (band, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, N), jnp.float32),
            pltpu.VMEM((halo, N), jnp.float32),
            pltpu.VMEM((halo, N), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        **params,
    )


def measure(label, win, k):
    data = jnp.asarray(
        np.random.default_rng(0).uniform(size=(N, N)).astype(np.float32)
    )

    @jax.jit
    def run_n(d, n):
        return jax.lax.fori_loop(0, n, lambda i, x: win(x), d)

    out = run_n(data, 2)
    float(jnp.sum(out))
    calls = 16384 // k
    t0 = time.perf_counter()
    out = run_n(data, calls)
    float(jnp.sum(out))
    el = time.perf_counter() - t0
    print(f"{label}: {N * N * k * calls / el:.4g} updates/s ({el:.2f}s)",
          flush=True)


CONFIGS = [
    (128, 16, None),   # production configuration (baseline)
    (256, 16, 48),
    (512, 16, 64),
    (1024, 16, 100),
    (256, 32, 64),
    (512, 32, 100),
    (128, 32, 48),
]

# remote TPU compiles can wedge for >15 min (CLAUDE.md); run ONE config per
# process (`experiment_2d_band.py <idx>`) so the driver can bound each with
# its own timeout instead of losing the whole sweep to one stuck compile
selected = (
    [CONFIGS[int(sys.argv[1])]] if len(sys.argv) > 1 else CONFIGS
)

for band, k, mb in selected:
    try:
        win = make_kernel(band, k, vmem_mb=mb)
        measure(f"band={band} k={k} vmem={mb or 16}M", win, k)
    except Exception as e:  # noqa: BLE001 - record and continue
        print(f"band={band} k={k} vmem={mb or 16}M failed: "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
