"""Spatially correlated (colored) random fields via spectral synthesis.

TPU-native re-design of the reference spectral noise
(`/root/reference/pde/tools/spectral.py:39-270`). Two implementations are
provided: a host-side numpy version for field initialization (matching the
reference semantics) and a JAX version usable inside jitted steppers with
explicit PRNG keys.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def _make_corr_spectrum(correlation: str, **kwargs) -> Callable | None:
    """Return sqrt-power-spectrum function of squared wavenumbers, or None."""
    if correlation in ("none", "delta"):
        return None
    if correlation == "gaussian":
        length_scale = kwargs.pop("length_scale", 1)
        if length_scale == 0:
            return None
        return lambda k2s: np.exp(-0.5 * length_scale**2 * k2s)
    if correlation == "power law":
        exponent = kwargs.pop("exponent", 0)
        if exponent == 0:
            return None
        return lambda k2s: k2s ** (exponent / 4)
    if correlation == "cosine":
        length_scale = kwargs.pop("length_scale", 1)
        sharpness2 = kwargs.pop("sharpness", 10) ** 2
        return lambda k2s: np.exp(
            -sharpness2 * (length_scale * np.sqrt(k2s) - 1) ** 2
        )
    raise ValueError(f"Unknown correlation `{correlation}`")


def _spectral_scaling(shape, discretization, corr_spectrum) -> np.ndarray:
    """Mode-amplitude scaling normalized so the field has unit variance."""
    dim = len(shape)
    dx_arr = np.broadcast_to(discretization, (dim,))
    k2s = np.array(0.0)
    for i in range(dim):
        k = np.fft.fftfreq(shape[i], dx_arr[i])
        k2s = np.add.outer(k2s, k**2)
    k2s.flat[0] = 1
    S_k = np.asarray(corr_spectrum(k2s), dtype=float)
    S_k.flat[0] = 0
    S_k = S_k / np.sum(S_k) * (np.prod(shape) ** 2)
    return np.sqrt(S_k)


def make_correlated_noise(
    shape: tuple[int, ...],
    correlation: str = "none",
    *,
    discretization=1.0,
    dtype=float,
    rng: np.random.Generator | None = None,
    **kwargs,
) -> Callable[[], np.ndarray]:
    """Return a function creating random fields with the given spatial correlation.

    Supported correlations: ``none``/``delta``, ``gaussian`` (``length_scale``),
    ``power law`` (``exponent``), ``cosine`` (``length_scale``, ``sharpness``).
    """
    rng = np.random.default_rng(rng)
    dtype = np.dtype(dtype)
    ret_complex = issubclass(dtype.type, np.complexfloating)
    corr_spectrum = _make_corr_spectrum(correlation, **kwargs)

    if corr_spectrum is None:
        if ret_complex:
            return lambda: (
                rng.normal(size=shape) + 1j * rng.normal(size=shape)
            ).astype(dtype)
        return lambda: rng.normal(size=shape).astype(dtype)

    scaling = _spectral_scaling(shape, discretization, corr_spectrum)
    dim = len(shape)

    def noise_corr() -> np.ndarray:
        arr = rng.normal(size=shape) + 1j * rng.normal(size=shape)
        arr *= scaling
        res = np.fft.ifftn(arr, s=shape, axes=range(dim))
        return res.astype(dtype) if ret_complex else res.real.astype(dtype)

    return noise_corr


def make_correlated_noise_jax(
    shape: tuple[int, ...],
    correlation: str = "none",
    *,
    discretization=1.0,
    **kwargs,
) -> Callable:
    """JAX version: returns ``noise(key) -> jax.Array``, usable inside jit/scan."""
    import jax
    import jax.numpy as jnp

    corr_spectrum = _make_corr_spectrum(correlation, **kwargs)
    if corr_spectrum is None:
        return lambda key: jax.random.normal(key, shape)

    scaling = jnp.asarray(_spectral_scaling(shape, discretization, corr_spectrum))
    dim = len(shape)

    def noise_corr(key):
        k_re, k_im = jax.random.split(key)
        arr = jax.random.normal(k_re, shape) + 1j * jax.random.normal(k_im, shape)
        arr = arr * scaling
        return jnp.real(jnp.fft.ifftn(arr, s=shape, axes=range(dim)))

    return noise_corr
