"""On-VPU noise-generation cost: Box-Muller vs cheap weak-scheme increments.

Round-2 finding (docs/BENCHMARKS.md): fused SDE windows are noise-
generation-bound — in-kernel `pltpu.prng_random_bits` + Box-Muller measured
14.7 G samples/s, below the XLA path's 21.3 G updates/s, so fusing lost.
The untried lever: Euler-Maruyama converges WEAKLY (order 1) for ANY
increment distribution matching the first moments (Kloeden & Platen, weak
Taylor schemes) — Gaussianity is not required. This experiment measures the
generation cost of progressively cheaper moment-matched increments:

- box-muller:  exact N(0,1), log+sqrt+sincos transcendentals
- irwin12:     sum of 12 uniforms - 6 (exact variance, |kurtosis err| 0.006)
- irwin4:      (sum of 4 uniforms - 2) * sqrt(3) (excess kurtosis -0.3)
- rademacher:  +-1 from one sign bit (two-point law; matches E x, E x^2,
               E x^3 — the minimal weak-order-1 increment)
- bits:        raw PRNG draw + bitcast only (the generation floor)

Usage: python scripts/experiment_sde_noise.py [n=4096] [iters=64]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BAND = int(__import__("os").environ.get("SDE_BAND", "256"))
assert N % BAND == 0

TWO24 = np.float32(2.0**-24)
SQRT3 = np.float32(np.sqrt(3.0))


def _to_f32(u32):
    # Mosaic has no uint32->f32 cast; values below 2^31 go via int32
    return pltpu.bitcast(u32, jnp.int32).astype(jnp.float32)


def uniform(shape):
    """U[0,1) from the top 24 bits of one PRNG draw."""
    bits = pltpu.prng_random_bits(shape)
    return (
        _to_f32(
            jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.uint32), np.uint32(8)
            )
        )
        * TWO24
    )


def gen_bits(shape):
    bits = pltpu.prng_random_bits(shape)
    return _to_f32(
        jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), np.uint32(1)
        )
    )


def gen_rademacher(shape):
    bits = pltpu.prng_random_bits(shape)
    sign = _to_f32(
        jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.uint32), np.uint32(31)
        )
    )
    return 1.0 - 2.0 * sign


def gen_irwin4(shape):
    s = uniform(shape)
    for _ in range(3):
        s = s + uniform(shape)
    return (s - 2.0) * SQRT3


def gen_irwin12(shape):
    s = uniform(shape)
    for _ in range(11):
        s = s + uniform(shape)
    return s - 6.0


def gen_box_muller(shape):
    u1 = jnp.maximum(uniform(shape), TWO24)
    u2 = uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


# Giles 2012 ("Approximating the erfinv function", GPU Computing Gems
# Jade ch. 10) single-precision rational approximation: exact normal LAW
# (f32-accurate quantile) from one uniform, swapping Box-Muller's cos for
# ~18 FMAs — polynomial FMAs are cheap on the VPU, transcendentals are not.
_ERFINV_P1 = [  # central branch, w = -log(1-x^2) - 2.5
    2.81022636e-08, 3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
    0.00021858087, -0.00125372503, -0.00417768164, 0.246640727, 1.50140941,
]
_ERFINV_P2 = [  # tail branch, w = sqrt(-log(1-x^2)) - 3
    -0.000200214257, 0.000100950558, 0.00134934322, -0.00367342844,
    0.00573950773, -0.0076224613, 0.00943887047, 1.00167406, 2.83297682,
]


def _erfinv_f32(x):
    w = -jnp.log((1.0 - x) * (1.0 + x))
    w1 = w - 2.5
    p1 = np.float32(_ERFINV_P1[0])
    for c in _ERFINV_P1[1:]:
        p1 = np.float32(c) + p1 * w1
    w2 = jnp.sqrt(w) - 3.0
    p2 = np.float32(_ERFINV_P2[0])
    for c in _ERFINV_P2[1:]:
        p2 = np.float32(c) + p2 * w2
    return jnp.where(w < 5.0, p1, p2) * x


def gen_erfinv(shape):
    """Exact-normal increments: sqrt(2) * erfinv(2u - 1)."""
    u = jnp.maximum(uniform(shape), TWO24)
    return np.float32(np.sqrt(2.0)) * _erfinv_f32(2.0 * u - 1.0)


GENERATORS = {
    "bits": gen_bits,
    "rademacher": gen_rademacher,
    "irwin4": gen_irwin4,
    "irwin12": gen_irwin12,
    "box-muller": gen_box_muller,
    "erfinv": gen_erfinv,
}


def make_bench(gen):
    def kernel(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        # fori_loop keeps the Mosaic program small (irwin12 draws 12 PRNG
        # blocks per iteration; unrolling ITERS of those wedges the compile)
        acc = jax.lax.fori_loop(
            0,
            ITERS,
            lambda i, a: a + gen((BAND, N)),
            jnp.zeros((BAND, N), jnp.float32),
        )
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        grid=(N // BAND,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (BAND, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return jax.jit(lambda seed: call(seed))


def main():
    print(f"n={N} iters={ITERS} samples/call={N * N * ITERS:.3e}")
    seed = jnp.asarray([12345], jnp.int32)
    for name, gen in GENERATORS.items():
        try:
            run = make_bench(gen)
            out = run(seed)
            s = float(jnp.sum(out))  # force completion (axon tunnel)
            t0 = time.perf_counter()
            out = run(seed)
            s = float(jnp.sum(out))
            dt = time.perf_counter() - t0
            rate = N * N * ITERS / dt
            print(f"{name:11s}: {rate:.3e} samples/s  (sum={s:.1f})",
                  flush=True)
        except Exception as err:  # noqa: BLE001 - report and continue
            print(f"{name:11s}: FAILED {type(err).__name__}: {err}",
                  flush=True)
    # statistical sanity of the cheap generators (host-side moments)
    for name in ("irwin4", "irwin12", "rademacher", "erfinv"):
        run = make_bench(GENERATORS[name])
        arr = np.asarray(run(seed)) / np.sqrt(ITERS)  # CLT-normalized sums
        print(
            f"{name:11s}: mean={arr.mean():+.4f} var={arr.var():.4f} "
            f"(accumulated over {ITERS} draws -> should be ~N(0,1))",
            flush=True,
        )


if __name__ == "__main__":
    main()
