"""Fused Pallas windows on decomposed grids (multi-chip fast path).

The reference runs its fastest kernel under MPI with halo exchange inside the
compiled loop (`/root/reference/pde/backends/numba_mpi/backend.py:163-195`).
The TPU equivalent implemented here: the temporal-blocking kernel
(:func:`pde_tpu.ops.pallas_cartesian.make_affine_laplace_ext_2d`) runs under
``shard_map``, and a width-``halo`` halo is exchanged via paired
``lax.ppermute`` once per k-step kernel call instead of once per step — k×
fewer collectives than the reference's per-step send/recv.

Halo-exchange ordering: rows first, then columns *of the row-extended array*,
so corner data arrives from diagonal neighbors in two hops (the same
axis-ordering trick as the reference's send-before-recv per axis). When the
column axis is not decomposed the kernel keeps columns locally periodic via
lane rolls and no column halo is built at all — the fast path for the common
rows-only decomposition.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_halo_pad(mesh, halos: Sequence[int]) -> Callable:
    """Return ``pad(local) -> extended`` adding per-axis halos.

    Must be called inside ``shard_map`` over ``mesh.jax_mesh``. ``halos[ax]``
    is the halo width added on each side of grid axis ``ax`` (0 = skip). Axes
    with one shard wrap locally (the grid must be periodic along them);
    decomposed axes exchange halos with both neighbors via ``lax.ppermute``.
    """
    axis_names = mesh.axis_names
    decomposition = mesh.decomposition

    def pad(local):
        for ax, (name, n_shards, h) in enumerate(
            zip(axis_names, decomposition, halos, strict=True)
        ):
            if h == 0:
                continue
            lo = tuple(
                slice(-h, None) if i == ax else slice(None)
                for i in range(local.ndim)
            )
            hi = tuple(
                slice(0, h) if i == ax else slice(None) for i in range(local.ndim)
            )
            if n_shards == 1:
                before, after = local[lo], local[hi]
            else:
                fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
                bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
                before = jax.lax.ppermute(local[lo], name, fwd)
                after = jax.lax.ppermute(local[hi], name, bwd)
            local = jnp.concatenate([before, local, after], axis=ax)
        return local

    return pad


def make_fused_euler_window_sharded(
    mesh, *, diffusivity: float, dt: float, dtype=np.float32,
    interpret: bool = False, k: int = 8,
) -> Callable:
    """Sharded analogue of ``make_fused_euler_window_2d``.

    Returns ``window(local_data, steps) -> local_data`` meant to be traced
    INSIDE ``shard_map`` over ``mesh.jax_mesh``; ``local_data`` is one shard
    of the field. Requires a fully periodic 2D Cartesian grid whose subgrid
    shape passes :func:`supports_affine_laplace_ext`.
    """
    from ..ops.pallas_cartesian import (
        PallasUnsupportedError,
        ext_halo_width,
        make_affine_laplace_ext_2d,
        supports_affine_laplace_ext,
    )

    grid = mesh.basegrid
    if grid.num_axes != 2 or not all(grid.periodic):
        raise PallasUnsupportedError(
            "Sharded fused window requires a fully periodic 2D Cartesian grid"
        )
    local_shape = tuple(mesh.subgrid.shape)
    # columns stay locally periodic (lane rolls) unless the column axis is cut
    ext_cols = mesh.decomposition[1] > 1
    while k > 1 and not supports_affine_laplace_ext(
        local_shape, dtype, k, ext_cols=ext_cols, interpret=interpret
    ):
        k //= 2
    if not supports_affine_laplace_ext(
        local_shape, dtype, k, ext_cols=ext_cols, interpret=interpret
    ):
        raise PallasUnsupportedError(
            "Local shard shape unsupported by the halo-extended kernel"
        )
    disc = grid.discretization

    def build(kk):
        step = make_affine_laplace_ext_2d(
            local_shape, a=1.0, b=dt * diffusivity, k=kk, discretization=disc,
            ext_cols=ext_cols, dtype=dtype, interpret=interpret,
        )
        h = ext_halo_width(kk, interpret=interpret)
        pad = make_halo_pad(mesh, (h, h if ext_cols else 0))
        return lambda d: step(pad(d))

    from ..ops.pallas_cartesian import _make_binary_chunked_window

    return _make_binary_chunked_window(build, k)
