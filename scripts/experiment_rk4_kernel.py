"""Probe the fused RK4 kernel's throughput levers (band, k, live ranges).

Direct kernel microbenchmark without the solver stack: 2D diffusion RK4,
4096^2 f32 periodic. Variants:
  naive - k1..k3 stay live until the final tableau combine
  acc   - progressive accumulation (k_i folded into acc as soon as dead)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pde_tpu as pde  # noqa: E402
from pde_tpu.ops.pallas_cartesian import (  # noqa: E402
    _pick_band,
    make_fused_multi_stencil_window_2d,
)

N = 4096
D, dt = 0.5, 1e-5
grid = pde.UnitGrid([N, N], periodic=True)


def make_naive(ops):
    def rhs(w):
        return D * ops.lap(w)

    def step(works):
        w = works[0]
        t_ = ops.trim
        k1 = rhs(w)
        y2 = t_(w, 1) + (0.5 * dt) * k1
        k2 = rhs(y2)
        y3 = t_(w, 2) + (0.5 * dt) * k2
        k3 = rhs(y3)
        y4 = t_(w, 3) + dt * k3
        k4 = rhs(y4)
        return [
            t_(w, 4)
            + (dt / 6.0) * (t_(k1, 3) + 2.0 * t_(k2, 2) + 2.0 * t_(k3, 1) + k4)
        ]

    return step


def make_acc(ops):
    def rhs(w):
        return D * ops.lap(w)

    def step(works):
        w = works[0]
        t_ = ops.trim
        k1 = rhs(w)
        y = t_(w, 1) + (0.5 * dt) * k1
        k2 = rhs(y)
        acc = t_(k1, 3) + 2.0 * t_(k2, 2)
        y = t_(w, 2) + (0.5 * dt) * k2
        k3 = rhs(y)
        acc = acc + 2.0 * t_(k3, 1)
        y = t_(w, 3) + dt * k3
        k4 = rhs(y)
        return [t_(w, 4) + (dt / 6.0) * (acc + k4)]

    return step


data0 = jnp.asarray(
    np.random.default_rng(0).uniform(size=(N, N)).astype(np.float32)
)

for label, ms in [("naive", make_naive), ("acc", make_acc)]:
    for k in (1, 2):
        band = _pick_band(N, N, 4, k * 4)
        win, _ = make_fused_multi_stencil_window_2d(
            grid, ms, 4, 1, dtype=np.float32, k=k
        )

        @jax.jit
        def run_n(d, n, _w=win):
            return jax.lax.fori_loop(0, n, lambda i, x: _w([x])[0], d)

        out = run_n(data0, 4)
        float(jnp.sum(out))
        calls = 512 // k
        t0 = time.time()
        out = run_n(data0, calls)
        float(jnp.sum(out))
        el = time.time() - t0
        rate = N * N * k * calls / el
        print(
            f"{label} k={k} band={band}: {rate:.4g} updates/s "
            f"({el:.2f}s, {k * calls} steps)",
            flush=True,
        )
