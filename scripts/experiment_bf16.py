"""Round-3 perf experiment: bf16 fused compute via shifted-slice kernels.

Mosaic rejects `pltpu.roll` on non-32-bit data, which blocked bf16 in the
roll-based kernel (round-2 negative). The halo-EXTENDED kernel variant uses
shifted value slices instead of lane rolls, which have no such restriction:
this script measures (a) the f32 ext kernel vs the f32 roll kernel (the
slicing overhead) and (b) the bf16 ext kernel (VPU lanes double), on a
periodic 4096^2 diffusion window with the column halo padded by XLA.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import pde_tpu as pde
from pde_tpu.ops.pallas_cartesian import (
    make_affine_laplace_ext_2d,
    make_fused_euler_window_2d,
    ext_halo_width,
)

N = 4096
STEPS = 2048
grid = pde.UnitGrid([N, N], periodic=True)
rng = np.random.default_rng(0)
base = rng.random((N, N)).astype(np.float32)


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t1 = time.perf_counter()
    return N * N * STEPS / (t1 - t0), s


def run_roll(dtype):
    window = make_fused_euler_window_2d(
        grid, diffusivity=0.1, dt=1e-8, dtype=dtype
    )
    run = jax.jit(lambda d: window(d, STEPS))
    return timed(run, jnp.asarray(base, dtype))


def run_ext(dtype, k):
    h = ext_halo_width(k)
    step = make_affine_laplace_ext_2d(
        (N, N), a=1.0, b=1e-8 * 0.1, k=k,
        discretization=grid.discretization, ext_cols=True, dtype=dtype,
    )

    def window(d):
        def body(i, dd):
            ext = jnp.pad(dd, h, mode="wrap")
            return step(ext)

        return jax.lax.fori_loop(0, STEPS // k, body, d)

    run = jax.jit(window)
    return timed(run, jnp.asarray(base, dtype))


for name, fn, args in (
    ("f32 roll-kernel k=16 (baseline)", run_roll, (jnp.float32,)),
    ("f32 ext-kernel  k=8  (slice overhead)", run_ext, (jnp.float32, 8)),
    ("bf16 ext-kernel k=8", run_ext, (jnp.bfloat16, 8)),
):
    try:
        rate, s = fn(*args)
        print(f"{name}: {rate:.3e} cell-updates/s (sum={s:.1f})")
    except Exception as err:
        print(f"{name}: FAILED {type(err).__name__}: {str(err)[:300]}")
