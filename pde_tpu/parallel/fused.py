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

Physical (const-affine) boundary conditions are supported on non-periodic
axes: shards at a global edge skip the (meaningless) halo there and the
kernel rewrites the ghost row/column from the virtual-point formula each
step, gated by ``edge_flags`` computed from ``lax.axis_index``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_halo_pad(mesh, halos: Sequence[int], periodic: Sequence[bool] | None = None) -> Callable:
    """Return ``pad(local) -> extended`` adding per-axis halos.

    Must be called inside ``shard_map`` over ``mesh.jax_mesh``. ``halos[ax]``
    is the halo width added on each side of grid axis ``ax`` (0 = skip).
    Periodic axes wrap (locally when the axis has one shard, via circular
    ``lax.ppermute`` otherwise); non-periodic decomposed axes use open
    ppermute chains, so global-edge shards receive zeros there — the kernel's
    BC fixups overwrite those entries before use.
    """
    axis_names = mesh.axis_names
    decomposition = mesh.decomposition
    if periodic is None:
        periodic = [True] * len(decomposition)

    def pad(local):
        for ax, (name, n_shards, h, per) in enumerate(
            zip(axis_names, decomposition, halos, periodic, strict=True)
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
                if per:
                    before, after = local[lo], local[hi]
                else:
                    # physical edges on both sides: content is overwritten by
                    # the kernel's BC fixups, only the shape matters
                    before = jnp.zeros_like(local[lo])
                    after = jnp.zeros_like(local[hi])
            elif per:
                fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
                bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
                before = jax.lax.ppermute(local[lo], name, fwd)
                after = jax.lax.ppermute(local[hi], name, bwd)
            else:
                fwd = [(i, i + 1) for i in range(n_shards - 1)]
                bwd = [(i, i - 1) for i in range(1, n_shards)]
                before = jax.lax.ppermute(local[lo], name, fwd)
                after = jax.lax.ppermute(local[hi], name, bwd)
            local = jnp.concatenate([before, local, after], axis=ax)
        return local

    return pad


def make_fused_euler_window_sharded(
    mesh, *, diffusivity: float, dt: float, dtype=np.float32, bcs=None,
    interpret: bool = False, k: int = 8,
) -> Callable:
    """Sharded analogue of ``make_fused_euler_window_2d``.

    Returns ``window(local_data, steps) -> local_data`` meant to be traced
    INSIDE ``shard_map`` over ``mesh.jax_mesh``; ``local_data`` is one shard
    of the field. Axes must be periodic or carry const-affine BCs (passed via
    ``bcs``); the subgrid shape must pass
    :func:`supports_affine_laplace_ext`.
    """
    from ..ops.pallas_cartesian import (
        PallasUnsupportedError,
        _binary_kernel_ladder,
        _make_binary_chunked_window,
        affine_bc_specs,
        ext_halo_width,
        make_affine_laplace_ext_2d,
        supports_affine_laplace_ext,
    )

    from ..grids.cartesian import CartesianGrid
    from ..grids.cylindrical import CylindricalSymGrid

    grid = mesh.basegrid
    if isinstance(grid, CartesianGrid) and grid.num_axes == 3:
        return _make_fused_euler_window_sharded_3d(
            mesh, diffusivity=diffusivity, dt=dt, dtype=dtype, bcs=bcs,
            interpret=interpret,
        )
    if isinstance(grid, CylindricalSymGrid):
        # the (1/r) d/dr term lowers as per-row in-kernel coefficients at the
        # GLOBAL row index shard_offset + local row (radial= of the ext kernel)
        radial = (float(grid.axes_bounds[0][0]), float(grid.discretization[0]))
    elif isinstance(grid, CartesianGrid) and grid.num_axes == 2:
        radial = None
    else:
        # other curvilinear grids have coordinate-dependent stencils this
        # kernel does not model — without this guard they would silently
        # lose their radial terms on TPU
        raise PallasUnsupportedError(
            "Sharded fused window requires a 2D Cartesian/cylindrical grid"
        )
    bc_specs = None
    if not all(grid.periodic):
        if bcs is None:
            raise PallasUnsupportedError(
                "Non-periodic grids require explicit boundary conditions"
            )
        bc_specs = affine_bc_specs(grid, bcs)
        if any(
            side.f1_t is not None
            for pair in bc_specs or ()
            if pair is not None
            for side in pair
        ):
            # t-dependent ghost coefficients stage only through the
            # stencil-helper kernels (expression-compiled path)
            raise PallasUnsupportedError(
                "Time-dependent BC coefficients are not supported by the "
                "specialized sharded kernel"
            )
    local_shape = tuple(mesh.subgrid.shape)
    # columns stay locally periodic (lane rolls) unless the column axis is
    # cut or carries physical BCs (which need the extended representation
    # only when decomposed; single-shard columns use the roll fixups)
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
    periodic = [bool(p) for p in grid.periodic]
    axis_names = mesh.axis_names
    decomposition = mesh.decomposition

    def edge_flags():
        flags = []
        for ax in range(2):
            if periodic[ax]:
                flags += [jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)]
            else:
                idx = jax.lax.axis_index(axis_names[ax])
                flags += [
                    (idx == 0).astype(jnp.int32),
                    (idx == decomposition[ax] - 1).astype(jnp.int32),
                ]
        # global row offset of this shard (used by the radial term)
        row_off = jax.lax.axis_index(axis_names[0]) * np.int32(local_shape[0])
        flags.append(row_off.astype(jnp.int32))
        return jnp.stack(flags)

    local_rows, local_cols = local_shape

    def build(kk):
        step = make_affine_laplace_ext_2d(
            local_shape, a=1.0, b=dt * diffusivity, k=kk, discretization=disc,
            ext_cols=ext_cols, dtype=dtype, bc_specs=bc_specs,
            interpret=interpret, radial=radial,
        )
        h = ext_halo_width(kk, interpret=interpret)
        pad = make_halo_pad(mesh, (h, h if ext_cols else 0), periodic)
        # host-precompute padded GLOBAL boundary-value arrays per array slot;
        # the traced closure slices them by lax.axis_index (bit-identity rule:
        # never bake shard-varying data from the template at factory time)
        side_global = {}
        for slot in step.array_slots:
            spec = (bc_specs[0] if slot < 2 else bc_specs[1])[slot % 2]
            arr = np.asarray(spec.const_static, dtype=float).reshape(-1)
            if slot < 2 and not ext_cols:
                side_global[slot] = arr  # column axis not cut: whole row
            else:
                # wrap-pad by the halo width; at non-periodic global edges
                # the wrapped entries feed only halo cells the kernel's BC
                # fixups mask before use
                side_global[slot] = np.concatenate([arr[-h:], arr, arr[:h]])

        def step_fn(d, t_tab=None):
            extra = []
            for slot in step.array_slots:
                g = jnp.asarray(side_global[slot], dtype=dtype)
                if slot < 2:
                    if ext_cols:
                        off = jax.lax.axis_index(axis_names[1]) * np.int32(
                            local_cols
                        )
                        loc = jax.lax.dynamic_slice(
                            g, (off,), (local_cols + 2 * h,)
                        )
                    else:
                        loc = g
                    extra.append(loc.reshape(1, -1))
                else:
                    off = jax.lax.axis_index(axis_names[0]) * np.int32(
                        local_rows
                    )
                    loc = jax.lax.dynamic_slice(
                        g, (off,), (local_rows + 2 * h,)
                    )
                    extra.append(loc)
            if step.has_t:
                extra.append(t_tab)
            return step(pad(d), edge_flags(), *extra)

        return step_fn

    # time-dependent BC values need a per-chunk (k, 4) const table rebuilt
    # from t0, mirroring make_fused_euler_window_2d's t-branch
    t_funcs = [None, None, None, None]
    if bc_specs is not None:
        for base, axis_specs in zip((0, 2), bc_specs):
            if axis_specs is None:
                continue
            for side, spec in enumerate(axis_specs):
                if spec.const_t is not None:
                    t_funcs[base + side] = spec.const_t
    if not any(f is not None for f in t_funcs):
        return _make_binary_chunked_window(build, k)

    kernels = _binary_kernel_ladder(build, k)

    def make_t_tab(ts):
        cols = []
        for fn in t_funcs:
            if fn is None:
                cols.append(jnp.zeros_like(ts))
            else:
                cols.append(jax.vmap(fn)(ts))
        return jnp.stack(cols, axis=1)

    def window(data, t0, steps):
        index = jnp.asarray(0, jnp.int32)
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk

            def body(c, carry, _kk=kk, _step=step_fn):
                d, idx = carry
                ts = t0 + (idx + jnp.arange(_kk)) * dt
                return (_step(d, make_t_tab(ts)), idx + _kk)

            data, index = jax.lax.fori_loop(0, chunks, body, (data, index))
            remaining = remaining - chunks * kk
        return data

    window.needs_t = True
    return window


def _make_fused_euler_window_sharded_3d(
    mesh, *, diffusivity: float, dt: float, dtype=np.float32, bcs=None,
    interpret: bool = False,
) -> Callable:
    """Sharded 3D Euler diffusion window on halo-extended local blocks.

    x (the banded DMA axis) is always halo-extended; y/z are extended only
    when decomposed, otherwise they stay locally periodic via rolls with
    edge-flag-gated BC patches. The reference's 3D MPI regime
    (`/root/reference/pde/backends/numba_mpi/backend.py:163-195`), with one
    paired-ppermute exchange per k-step kernel call instead of per step.
    """
    from ..ops.pallas_cartesian import (
        PallasUnsupportedError,
        _make_binary_chunked_window,
        affine_bc_params,
        make_affine_laplace_ext_3d,
        supports_affine_laplace_ext_3d,
    )

    grid = mesh.basegrid
    bc_params = None
    if not all(grid.periodic):
        if bcs is None:
            raise PallasUnsupportedError(
                "Non-periodic grids require explicit boundary conditions"
            )
        bc_params = affine_bc_params(grid, bcs)
    local_shape = tuple(mesh.subgrid.shape)
    ext_axes = (
        True,  # x is the banded axis: always extended
        mesh.decomposition[1] > 1,
        mesh.decomposition[2] > 1,
    )

    # large (y, z) planes on x-cut-only decompositions: delegate to the
    # multi-field driver, whose halo-extended y-chunked route sustains the
    # deep temporal blocks (round-5; the affine roll kernel below caps at
    # k<=2 past 96 KB planes, 7.5e10 vs ~1e11 at 256³ serial)
    import os

    if ext_axes == (True, False, False) and (
        (interpret and os.environ.get("PDE_TPU_YCHUNK_SHARDED") == "1")
        or (
            not interpret
            and jax.default_backend() == "tpu"
            and np.dtype(dtype) == np.dtype(np.float32)
            and local_shape[1] * local_shape[2] * np.dtype(dtype).itemsize
            > 96 * 1024
        )
    ):
        b = dt * diffusivity

        def make_step(h):
            def step(works):
                (w,) = works
                return [h.trim(w, 1) + b * h.lap(w, bc=bc_params)]

            return step

        try:
            inner = _make_fused_multi_window_sharded_3d(
                mesh, make_step, 1, 1, dtype=dtype, interpret=interpret,
            )

            def window(data, steps):
                return inner([data], steps)[0]

            return window
        except PallasUnsupportedError:
            pass  # fall through to the affine roll kernel

    k = 4
    while k > 1 and not supports_affine_laplace_ext_3d(
        local_shape, dtype, k, ext_axes=ext_axes, interpret=interpret
    ):
        k //= 2
    if not supports_affine_laplace_ext_3d(
        local_shape, dtype, k, ext_axes=ext_axes, interpret=interpret
    ):
        raise PallasUnsupportedError(
            "Local shard shape unsupported by the 3D halo-extended kernel"
        )
    disc = grid.discretization
    periodic = [bool(p) for p in grid.periodic]
    axis_names = mesh.axis_names
    decomposition = mesh.decomposition

    def edge_flags():
        flags = []
        for ax in range(3):
            if periodic[ax]:
                flags += [jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)]
            else:
                idx = jax.lax.axis_index(axis_names[ax])
                flags += [
                    (idx == 0).astype(jnp.int32),
                    (idx == decomposition[ax] - 1).astype(jnp.int32),
                ]
        return jnp.stack(flags)

    def build(kk):
        step = make_affine_laplace_ext_3d(
            local_shape, a=1.0, b=dt * diffusivity, k=kk, discretization=disc,
            ext_axes=ext_axes, dtype=dtype, bc_params=bc_params,
            interpret=interpret,
        )
        halos = tuple(kk if e else 0 for e in ext_axes)
        pad = make_halo_pad(mesh, halos, periodic)
        return lambda d: step(pad(d), edge_flags())

    return _make_binary_chunked_window(build, k)


def make_fused_multi_window_sharded(
    mesh, make_step, halo_per_step: int, n_fields: int, *, dtype=np.float32,
    interpret: bool = False, bc_inputs=None, dt=None, stage_offsets=None,
) -> Callable:
    """Sharded multi-field window: all fields share one HBM pass per k steps.

    Returns ``window(local_datas, steps) -> local_datas`` for use INSIDE
    ``shard_map``. Rows are always halo-extended (the banded DMA axis);
    columns are extended when the column axis is decomposed, otherwise they
    stay locally periodic via lane rolls. Physical (const-affine) BCs pass
    through the helpers' ``bc=`` parameters of ``make_step``, gated by the
    per-shard global-edge flags — the reference's coupled systems run
    decomposed with full BC support
    (`/root/reference/pde/solvers/explicit_mpi.py:24`).

    ``bc_inputs`` (:func:`collect_bc_side_inputs` output) lowers
    inhomogeneous per-boundary-point arrays and t-dependent expression
    consts: host-precomputed GLOBAL value vectors are wrap-padded by the
    halo width and sliced per shard by ``lax.axis_index`` INSIDE the traced
    closure (bit-identity rule), feeding the ext kernel's runtime side
    inputs; t-dependent consts rebuild a per-chunk ``(k, n_t)`` SMEM table
    from the window's ``t0`` — the window then has signature
    ``window(local_datas, t0, steps)`` (attribute ``needs_t``, ``dt``
    required).
    """
    from ..ops.pallas_cartesian import (
        PallasUnsupportedError,
        _binary_kernel_ladder,
        _make_binary_chunked_window,
        _t_slot_funcs,
        ext_halo_width,
        make_fused_multi_ext_window_2d,
    )

    from ..grids.cartesian import CartesianGrid

    grid = mesh.basegrid
    if isinstance(grid, CartesianGrid) and grid.num_axes == 3:
        return _make_fused_multi_window_sharded_3d(
            mesh, make_step, halo_per_step, n_fields, dtype=dtype,
            interpret=interpret, bc_inputs=bc_inputs, dt=dt,
            stage_offsets=stage_offsets,
        )
    if not isinstance(grid, CartesianGrid) or grid.num_axes != 2:
        raise PallasUnsupportedError(
            "Sharded multi-field window requires a 2D Cartesian grid"
        )
    local_rows, local_cols = mesh.subgrid.shape
    ext_cols = mesh.decomposition[1] > 1
    periodic = [bool(p) for p in grid.periodic]
    axis_names = mesh.axis_names
    decomposition = mesh.decomposition
    n_rows_g, n_cols_g = grid.shape

    def edge_flags():
        flags = []
        for ax in range(2):
            if periodic[ax]:
                flags += [jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)]
            else:
                idx = jax.lax.axis_index(axis_names[ax])
                flags += [
                    (idx == 0).astype(jnp.int32),
                    (idx == decomposition[ax] - 1).astype(jnp.int32),
                ]
        row_off = jax.lax.axis_index(axis_names[0]) * np.int32(local_rows)
        flags.append(row_off.astype(jnp.int32))
        return jnp.stack(flags)

    offsets = tuple(stage_offsets) if stage_offsets is not None else (0.0,)
    n_stages = len(offsets)

    def build(kk):
        step, _ = make_fused_multi_ext_window_2d(
            grid, make_step, halo_per_step, n_fields, local_rows=local_rows,
            local_cols=local_cols, ext_cols=ext_cols, dtype=dtype, k=kk,
            interpret=interpret, bc_inputs=bc_inputs,
            stages_per_step=n_stages,
        )
        h = ext_halo_width(kk * halo_per_step, interpret=interpret)
        pad = make_halo_pad(mesh, (h, h if ext_cols else 0), periodic)
        # host-precompute padded GLOBAL boundary-value arrays per runtime
        # slot (BC consts AND array-valued factors, attr per entry); the
        # traced closure slices them by lax.axis_index (at non-periodic
        # global edges the wrapped entries feed only halo cells the
        # kernel's edge fixups mask before use)
        side_global = []
        for kind, spec, attr in step.array_entries:
            arr = np.asarray(getattr(spec, attr), dtype=float).reshape(-1)
            if kind == "row" and not ext_cols:
                side_global.append((kind, arr))  # column axis not cut
            else:
                side_global.append(
                    (kind, np.concatenate([arr[-h:], arr, arr[:h]]))
                )

        def step_fn(datas, ts=None):
            extra = []
            for kind, g_np in side_global:
                g = jnp.asarray(g_np, dtype=dtype)
                if kind == "row":
                    if ext_cols:
                        off = jax.lax.axis_index(axis_names[1]) * np.int32(
                            local_cols
                        )
                        g = jax.lax.dynamic_slice(
                            g, (off,), (local_cols + 2 * h,)
                        )
                else:
                    off = jax.lax.axis_index(axis_names[0]) * np.int32(
                        local_rows
                    )
                    g = jax.lax.dynamic_slice(g, (off,), (local_rows + 2 * h,))
                extra.append(g)
            # space-AND-time consts: evaluate the GLOBAL per-step table for
            # this chunk, wrap-pad along the point axis, slice per shard
            for kind, spec in step.xt_entries:
                tab = jax.vmap(spec.const_xt)(ts).astype(dtype)
                kk = tab.shape[0]
                if kind == "row" and not ext_cols:
                    pass  # column axis not cut: the whole row applies
                else:
                    tab = jnp.concatenate(
                        [tab[:, -h:], tab, tab[:, :h]], axis=1
                    )
                    ax = 1 if kind == "row" else 0
                    n_loc = local_cols if kind == "row" else local_rows
                    off = jax.lax.axis_index(axis_names[ax]) * np.int32(n_loc)
                    tab = jax.lax.dynamic_slice(
                        tab, (np.int32(0), off), (kk, n_loc + 2 * h)
                    )
                extra.append(tab)
            if step.t_specs is not None:
                cols = [jax.vmap(fn)(ts) for fn in
                        _t_slot_funcs(step.t_specs)]
                extra.append(jnp.stack(cols, axis=1))
            return tuple(
                step([pad(d) for d in datas], edge_flags(), *extra)
            )

        return step_fn

    # probe the largest supported k (small shards need smaller halos)
    k = None
    probe_k = max(1, 8 // halo_per_step)
    while probe_k >= 1:
        try:
            _, k = make_fused_multi_ext_window_2d(
                grid, make_step, halo_per_step, n_fields,
                local_rows=local_rows, local_cols=local_cols,
                ext_cols=ext_cols, dtype=dtype, k=probe_k,
                interpret=interpret, bc_inputs=bc_inputs,
                stages_per_step=n_stages,
            )
            break
        except PallasUnsupportedError:
            probe_k //= 2
    if k is None:
        raise PallasUnsupportedError(
            "Shard too small for any temporal-blocking factor"
        )

    needs_time = bc_inputs is not None and (
        bc_inputs["t"] or bc_inputs.get("xt")
    )
    if not needs_time:
        window_t = _make_binary_chunked_window(build, k)

        def window(datas, steps):
            return list(window_t(tuple(datas), steps))

        window.multi_field = True
        return window

    if dt is None:
        raise ValueError("dt is required for time-dependent BC windows")
    kernels = _binary_kernel_ladder(build, k)
    stage_frac = jnp.asarray(offsets)

    def window_td(datas, t0, steps):
        state = tuple(datas)
        index = jnp.asarray(0, jnp.int32)
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk

            def body(c, carry, _kk=kk, _step=step_fn):
                d, idx = carry
                # (step, stage)-major rows (S == 1: plain per-step table)
                base = t0 + (idx + jnp.arange(_kk)) * dt
                ts = (base[:, None] + stage_frac[None, :] * dt).reshape(-1)
                return (_step(d, ts), idx + _kk)

            state, index = jax.lax.fori_loop(0, chunks, body, (state, index))
            remaining = remaining - chunks * kk
        return list(state)

    window_td.multi_field = True
    window_td.needs_t = True
    return window_td


def _make_fused_multi_window_sharded_3d(
    mesh, make_step, halo_per_step: int, n_fields: int, *,
    dtype=np.float32, interpret: bool = False, bc_inputs=None, dt=None,
    stage_offsets=None,
) -> Callable:
    """Sharded 3D multi-field window: expression rhs trees on decomposed
    volumes.

    x (the banded DMA axis) is always halo-extended; y/z are extended only
    when decomposed, otherwise they stay locally periodic via rolls with
    edge-flag-gated BC patches — the 3D analogue of
    :func:`make_fused_multi_window_sharded`, with one paired-ppermute
    exchange per k-step kernel call.

    ``bc_inputs`` (:func:`collect_bc_side_inputs_3d` output) lowers
    per-face value arrays and t-dependent consts on decomposed volumes:
    host-precomputed GLOBAL face arrays (wrap-padded along x and every
    decomposed axis) are sliced per shard by ``lax.axis_index`` inside the
    traced closure (the bit-identity rule) and fed to the ext kernel as
    runtime side inputs; the per-step SMEM t-table rebuilds per chunk from
    the window's ``t0`` (``window(datas, t0, steps)``, attribute
    ``needs_t``).
    """
    from ..ops.pallas_cartesian import (
        PallasUnsupportedError,
        _binary_kernel_ladder,
        _make_binary_chunked_window,
        _t_slot_funcs,
        make_fused_multi_ext_window_3d,
    )

    grid = mesh.basegrid
    offsets = tuple(stage_offsets) if stage_offsets is not None else (0.0,)
    n_stages = len(offsets)
    local_shape = tuple(mesh.subgrid.shape)
    lx, ly, lz = local_shape
    ext_axes = (
        True,  # x is the banded axis: always extended
        mesh.decomposition[1] > 1,
        mesh.decomposition[2] > 1,
    )
    periodic = [bool(p) for p in grid.periodic]
    axis_names = mesh.axis_names
    decomposition = mesh.decomposition

    def edge_flags():
        flags = []
        for ax in range(3):
            if periodic[ax]:
                flags += [jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)]
            else:
                idx = jax.lax.axis_index(axis_names[ax])
                flags += [
                    (idx == 0).astype(jnp.int32),
                    (idx == decomposition[ax] - 1).astype(jnp.int32),
                ]
        return jnp.stack(flags)

    def build(kk):
        step, _ = make_fused_multi_ext_window_3d(
            grid, make_step, halo_per_step, n_fields,
            local_shape=local_shape, ext_axes=ext_axes, dtype=dtype, k=kk,
            interpret=interpret, bc_inputs=bc_inputs,
            stages_per_step=n_stages,
        )
        h = kk * halo_per_step
        halos = tuple(h if e else 0 for e in ext_axes)
        pad = make_halo_pad(mesh, halos, periodic)
        # host-precompute padded GLOBAL per-face value arrays; the traced
        # closure slices them per shard by lax.axis_index (wrapped entries
        # at non-periodic global edges feed only halo cells the kernel's
        # edge fixups mask before use). Face layouts: ax 0 -> (ny, nz)
        # plane; ax 1 -> (nx, nz); ax 2 -> (nx, ny).
        side_global = []
        for ax, spec, attr in step.array_entries:
            arr = np.asarray(getattr(spec, attr), dtype=float)
            if ax == 0:
                dims = (1, 2)  # varies over (y, z)
            elif ax == 1:
                dims = (0, 2)  # varies over (x, z)
            else:
                dims = (0, 1)  # varies over (x, y)
            arr = arr.reshape(
                tuple(grid.shape[d] for d in dims)
            )
            # wrap-pad each staged dim that carries halos: x always (the
            # kernel's per-program slice covers [x0 - h, x0 + band + h)),
            # decomposed y/z by the exchange halo
            pads = []
            for d in dims:
                hd = h if (d == 0 and ax != 0) or (
                    d > 0 and ext_axes[d]
                ) else 0
                pads.append(hd)
            for axis_i, hd in enumerate(pads):
                if hd:
                    arr = np.concatenate(
                        [
                            arr.take(range(arr.shape[axis_i] - hd,
                                           arr.shape[axis_i]), axis=axis_i),
                            arr,
                            arr.take(range(hd), axis=axis_i),
                        ],
                        axis=axis_i,
                    )
            side_global.append((ax, dims, pads, arr))

        def face_dims_pads(ax):
            if ax == 0:
                dims = (1, 2)
            elif ax == 1:
                dims = (0, 2)
            else:
                dims = (0, 1)
            pads = [
                h if (d == 0 and ax != 0) or (d > 0 and ext_axes[d]) else 0
                for d in dims
            ]
            return dims, pads

        def slice_side(dims, pads, g, lead=0):
            starts = [jnp.int32(0)] * lead
            sizes = list(g.shape[:lead])
            for d, hd in zip(dims, pads, strict=True):
                n_loc = local_shape[d]
                off = jax.lax.axis_index(axis_names[d]) * np.int32(n_loc)
                starts.append(off.astype(jnp.int32))
                sizes.append(n_loc + 2 * hd)
            return jax.lax.dynamic_slice(g, tuple(starts), tuple(sizes))

        # space-AND-time values: evaluate the GLOBAL per-chunk face table,
        # wrap-pad like the static faces, slice per shard (leading k dim
        # passes through)
        xt_info = []
        for ax, spec in step.xt_entries:
            dims, pads = face_dims_pads(ax)
            face = tuple(grid.shape[d] for d in dims)
            xt_info.append((ax, dims, pads, face, spec.const_xt))

        def step_fn(datas, ts=None):
            extra = [
                slice_side(dims, pads, jnp.asarray(g_np, dtype=dtype))
                for ax, dims, pads, g_np in side_global
            ]
            for ax, dims, pads, face, fn in xt_info:
                tab = jax.vmap(fn)(ts).astype(dtype)
                tab = tab.reshape(tab.shape[0], *face)
                for axis_i, hd in enumerate(pads):
                    if hd:
                        a = axis_i + 1  # leading k dim
                        tab = jnp.concatenate(
                            [
                                jax.lax.slice_in_dim(
                                    tab, tab.shape[a] - hd, tab.shape[a],
                                    axis=a,
                                ),
                                tab,
                                jax.lax.slice_in_dim(tab, 0, hd, axis=a),
                            ],
                            axis=a,
                        )
                extra.append(slice_side(dims, pads, tab, lead=1))
            if step.t_specs is not None:
                cols = [jax.vmap(fn)(ts) for fn in
                        _t_slot_funcs(step.t_specs)]
                extra.append(jnp.stack(cols, axis=1))
            return tuple(
                step([pad(d) for d in datas], edge_flags(), *extra)
            )

        return step_fn

    # x-cut-only decompositions with large (y, z) planes route through the
    # halo-extended Y-CHUNKED kernel (round-5): the roll path keeps whole
    # planes in VMEM and degrades to k<=2 past 96 KB, while y chunking
    # sustains the deep temporal blocks the serial kernel measured at 256³.
    # Scalar-affine BCs only (side inputs stay on the roll path below);
    # PDE_TPU_YCHUNK_SHARDED=1 forces the route in interpret mode (tests).
    ychunk_cfg = None
    if ext_axes == (True, False, False) and bc_inputs is None:
        import os

        from ..ops.pallas_cartesian import (
            _make_ychunk_multi_window_3d,
            _pick_ychunk_3d,
            _ychunk_interpret_cfg,
        )

        itemsize = np.dtype(dtype).itemsize
        try:
            if interpret:
                if os.environ.get("PDE_TPU_YCHUNK_SHARDED") == "1":
                    ychunk_cfg = _ychunk_interpret_cfg(
                        (lx, ly, lz), halo_per_step, None
                    )
            elif (
                jax.default_backend() == "tpu"
                and np.dtype(dtype) == np.dtype(np.float32)
                and ly * lz * n_fields * itemsize > 96 * 1024
            ):
                ychunk_cfg = _pick_ychunk_3d(
                    (lx, ly, lz), itemsize, halo_per_step, n_fields
                )
        except PallasUnsupportedError:
            ychunk_cfg = None
    if ychunk_cfg is not None:
        c_band, c_nyc, c_k = ychunk_cfg

        def build_ychunk(kk):
            step, _ = _make_ychunk_multi_window_3d(
                grid, make_step, halo_per_step, n_fields, band=c_band,
                ny_c=c_nyc, k=kk, dtype=dtype, interpret=interpret,
                ext_x=True, local_nx=lx,
            )
            pad = make_halo_pad(mesh, (kk * halo_per_step, 0, 0), periodic)
            return lambda d: tuple(step([pad(x) for x in d], edge_flags()))

        try:
            window_t = _make_binary_chunked_window(build_ychunk, c_k)
        except PallasUnsupportedError:
            window_t = None  # fall through to the roll path
        if window_t is not None:

            def window_y(datas, steps):
                return list(window_t(tuple(datas), steps))

            window_y.multi_field = True
            return window_y

    # probe the largest supported k (small shards need smaller halos)
    k = None
    probe_k = max(1, 4 // halo_per_step)
    while probe_k >= 1:
        try:
            _, k = make_fused_multi_ext_window_3d(
                grid, make_step, halo_per_step, n_fields,
                local_shape=local_shape, ext_axes=ext_axes, dtype=dtype,
                k=probe_k, interpret=interpret, bc_inputs=bc_inputs,
                stages_per_step=n_stages,
            )
            break
        except PallasUnsupportedError:
            probe_k //= 2
    if k is None:
        raise PallasUnsupportedError(
            "Shard too small for any temporal-blocking factor"
        )

    needs_time = bc_inputs is not None and (
        bc_inputs["t"] or bc_inputs.get("xt")
    )
    if not needs_time:
        window_t = _make_binary_chunked_window(build, k)

        def window(datas, steps):
            return list(window_t(tuple(datas), steps))

        window.multi_field = True
        return window

    if dt is None:
        raise ValueError("dt is required for time-dependent BC windows")
    kernels = _binary_kernel_ladder(build, k)
    stage_frac = jnp.asarray(offsets)

    def window_td(datas, t0, steps):
        state = tuple(datas)
        index = jnp.asarray(0, jnp.int32)
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk

            def body(c, carry, _kk=kk, _step=step_fn):
                d, idx = carry
                # (step, stage)-major rows (S == 1: plain per-step table)
                base = t0 + (idx + jnp.arange(_kk)) * dt
                ts = (base[:, None] + stage_frac[None, :] * dt).reshape(-1)
                return (_step(d, ts), idx + _kk)

            state, index = jax.lax.fori_loop(0, chunks, body, (state, index))
            remaining = remaining - chunks * kk
        return list(state)

    window_td.multi_field = True
    window_td.needs_t = True
    return window_td
