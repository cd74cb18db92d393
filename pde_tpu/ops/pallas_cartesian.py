"""Fused Pallas stencil kernels for 2D Cartesian grids (temporal blocking).

The hot path of explicit PDE stepping is HBM-bandwidth bound: the XLA lowering
of one Euler diffusion step costs ~5 full-array HBM passes (pad copy + fused
stencil/axpy), ≈45 G cell-updates/s at 4096² on TPU v5e. This kernel computes
``k`` successive steps of ``f <- a*f + b*laplace(f)`` per HBM pass: each
program DMAs one row band plus a k-row halo into VMEM, advances k steps
in-register (the valid region shrinks by one row per step, exactly consuming
the halo), and writes the band once. Columns are periodic via lane rolls.
Measured ≈1.8e11 cell-updates/s at 4096² with k=16 — ~3.8x the XLA path and
18x the project's 1e10 baseline target on a single chip (VPU-bound; see
docs/BENCHMARKS.md roofline).

Falls back to the jnp lowering whenever preconditions fail (unsupported BC
types, unaligned shapes, non-TPU backends, float64). Periodic and
const-affine BCs (Dirichlet/Neumann/Robin/curvature) lower into the kernels;
coupled multi-field systems and shard_map-decomposed grids have their own
variants below.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grids.cartesian import CartesianGrid

_HALO = 8  # DMA sublane alignment granule for f32


class PallasUnsupportedError(NotImplementedError):
    """The configuration cannot be lowered to the fused Pallas kernel."""


def interpret_requested() -> bool:
    """True when Pallas kernels should run in interpret mode (CPU tests)."""
    return os.environ.get("PDE_TPU_PALLAS_INTERPRET") == "1"


def _corner_weight() -> float:
    """The configured 2D corner weight (0 = default 5-point Laplacian)."""
    from ..utils.config import config

    return float(config["operators.cartesian.laplacian_2d_corner_weight"])


def _require_default_laplace_stencil():
    """Refuse (-> XLA fallback, which honors the config) when the 9-point
    corner-weight stencil is requested via
    ``operators.cartesian.laplacian_2d_corner_weight`` (reference
    `backends/numba/operators/cartesian.py:109-192`) on a kernel family
    that only lowers the 5-point form. The fully periodic 2D affine kernel
    DOES lower the 9-point stencil (see :func:`make_affine_laplace_2d`) and
    skips this gate; 3D kernels never gate — the config key is 2D-only."""
    if _corner_weight() != 0:
        raise PallasUnsupportedError(
            "This fused kernel family implements the 5-point Laplacian only "
            "(laplacian_2d_corner_weight != 0 falls back to XLA)"
        )


_MOSAIC_VMEM_DEFAULT = 16 * 1024 * 1024  # Mosaic's own scoped-VMEM default.
# Raising ``vmem_limit_bytes`` is NOT free: the round-5 hardware sweep found
# Mosaic's scheduling degrades as the limit GROWS (band 128 under a blanket
# 100 MB limit ran 13% slower than under the compiler default — 1.566e11 vs
# 1.796e11 — and band 512 recovered from 1.657e11 at 100 MB to 1.849e11 at
# 56 MB). Policy: kernels whose footprint fits the default pass NO compiler
# params; bigger bands pass the TIGHTEST viable limit via ``vmem_footprint``
# (v5e has 128 MB physical VMEM per core, so headroom exists when needed).

_MB8 = 8 * 1024 * 1024


def _tight_vmem_limit(footprint: int) -> int:
    """Smallest viable ``vmem_limit_bytes`` for a kernel's VMEM footprint.

    The footprint model (see :func:`_band_footprint`) tracks Mosaic's real
    allocation to within ~1 MB (it reproduces the measured 6.45 MB overshoot
    of band 256 over the 16 MB default at 4096² f32 k=16); a 2 MB pad plus
    rounding up to the 8 MB granule absorbs the residual."""
    return -(-(footprint + 2 * 1024 * 1024) // _MB8) * _MB8

_VMEM_BUDGET = 15 * 1024 * 1024  # default band-picker budget (multi-field /
# SDE / ext kernels: their per-field working sets multiply, and k=16 with a
# doubled set measured SLOWER on the VPU-bound multi windows — see
# docs/BENCHMARKS.md)

_VMEM_BUDGET_AFFINE = 48 * 1024 * 1024  # single-field affine 2D kernels:
# the round-5 hardware sweep under the raised compiler limit measured
# band=512 (this budget) at +6% over band=128 on the production kernel
# (1.657e11 vs 1.563e11 same-session; prototype roll kernel +22%), cutting
# the temporal-block overlap recompute from 12.5% to 3.1% at k=16


def _vmem_budget(default: int = _VMEM_BUDGET) -> int:
    """Band-picker VMEM budget; ``PDE_TPU_VMEM_BUDGET_MB`` overrides (sweeps)."""
    mb = os.environ.get("PDE_TPU_VMEM_BUDGET_MB")
    return int(mb) * 1024 * 1024 if mb else default


def _pallas_call(pl, pltpu, *args, interpret: bool, vmem_footprint: int = 0,
                 **kwargs):
    """``pl.pallas_call`` with a footprint-tight scoped-VMEM compiler limit.

    Interpret mode takes no TPU compiler params. On hardware, a kernel whose
    ``vmem_footprint`` fits Mosaic's 16 MB default passes NO compiler params
    (measured fastest — see ``_MOSAIC_VMEM_DEFAULT``); a bigger footprint
    gets the tightest viable limit. ``PDE_TPU_VMEM_LIMIT_MB`` overrides for
    hardware sweeps (``0`` = force Mosaic's own default); an explicit
    ``compiler_params`` kwarg wins over everything. A raised
    ``PDE_TPU_VMEM_BUDGET_MB`` (the band-picker sweep knob) also floors the
    footprint, so kernels whose factories don't plumb an exact model still
    compile when a sweep pushes their band past the Mosaic default.
    """
    if interpret:
        kwargs.pop("compiler_params", None)
        return pl.pallas_call(*args, interpret=True, **kwargs)
    mb_budget = os.environ.get("PDE_TPU_VMEM_BUDGET_MB")
    if mb_budget:
        vmem_footprint = max(vmem_footprint, int(mb_budget) * 1024 * 1024)
    mb = os.environ.get("PDE_TPU_VMEM_LIMIT_MB")
    if mb is not None:
        limit = int(mb) * 1024 * 1024
    elif vmem_footprint > _MOSAIC_VMEM_DEFAULT:
        limit = _tight_vmem_limit(vmem_footprint)
    else:
        limit = 0
    if limit:
        kwargs.setdefault(
            "compiler_params", pltpu.CompilerParams(vmem_limit_bytes=limit)
        )
    return pl.pallas_call(*args, **kwargs)


def _band_footprint(band: int, n_cols: int, itemsize: int, k: int) -> int:
    """Per-program VMEM footprint of a banded 2D kernel.

    Validated against hardware: at 4096² f32 k=16 the band=256 variant
    measured 6.45 MB over the 16 MB scoped-VMEM limit and band=128 fits,
    which this model reproduces. Terms: the band input buffer, the pipelined
    output block (double-buffered), two DMA halo buffers, and ~3 live
    work-region temporaries of (band + 2k) rows inside the step loop."""
    halo = -(-k // _HALO) * _HALO
    rows = 2 * band + 2 * halo + 3 * (band + 2 * k)
    return rows * n_cols * itemsize


def _pick_band(
    n_rows: int, n_cols: int, itemsize: int, k: int,
    budget: int = _VMEM_BUDGET,
) -> int:
    """Largest row-band dividing n_rows whose per-program VMEM footprint fits.

    Footprint model: :func:`_band_footprint`. ``PDE_TPU_FORCE_BAND`` pins the
    band for hardware sweeps (the caller is responsible for divisibility;
    geometry gates still apply).
    """
    forced = os.environ.get("PDE_TPU_FORCE_BAND")
    if forced and n_rows % int(forced) == 0:
        return int(forced)
    budget = _vmem_budget(budget)

    def footprint(band):
        return _band_footprint(band, n_cols, itemsize, k)

    for candidate in (512, 256, 128, 64, 32, 16, 8):
        if footprint(candidate) <= budget and n_rows % candidate == 0:
            return candidate
    # nothing divides n_rows: one program over the whole array (interpret mode
    # only — the TPU path requires n_rows % 8 == 0, so a candidate matched)
    return n_rows


def _fused_geometry_ok(
    n_rows: int, n_cols_eff: int, itemsize: int, k_total: int
) -> bool:
    """Band/halo geometry constraints that hold in EVERY mode.

    This is a correctness (not TPU-tiling) constraint, so interpret-mode
    callers must enforce it too: ``halo <= band`` keeps the wrapped halo DMA
    slices inside the array (``pl.ds`` clamps instead of wrapping when a
    slice crosses the array end, silently feeding garbage rows into the
    stencil). ``n_cols_eff`` must match what the kernel passes to
    :func:`_pick_band` (e.g. ``n_cols * n_fields`` for multi-field kernels).
    """
    if not 1 <= k_total <= 4 * _HALO:
        return False
    band = _pick_band(n_rows, n_cols_eff, itemsize, k_total)
    halo = -(-k_total // _HALO) * _HALO  # rounded up to the DMA granule
    return halo <= band


def _radial_row_coeffs(radial, a, b, sx, sy, dtype, row_start, length):
    """Folded per-row cylindrical coefficients for work rows
    ``[row_start, row_start + length)`` (``row_start`` may be traced).

    The ``(1/r) d/dr`` term folds into up/down row factors:
    ``a*c + b*sx*(up+down-2c) + b*sy*(l+r-2c) + fac*(down-up)
      = cu*up + cd*down + (b*sy)*(l+r) + (a-2b(sx+sy))*c``
    (8 VPU ops/cell/step instead of 12 in the compute-bound loop). Returns
    ``(cu_full, cd_full, c_center)`` with the row factors as ``(length, 1)``
    arrays; ``r`` is never exactly 0 at cell centers or ghost rows
    (``(row+0.5)*dr``), and out-of-range rows produce finite garbage that the
    shrinking trapezoid + BC fixups discard. Shared by the single-device and
    halo-extended kernels so the two cylindrical paths stay identical.
    """
    import jax
    import jax.numpy as jnp

    r_lo, dr_r = radial
    rows_g = row_start + jax.lax.broadcasted_iota(jnp.int32, (length, 1), 0)
    r_vals = (rows_g.astype(dtype) + 0.5) * dr_r + r_lo
    fac_full = (b / (2.0 * dr_r)) / r_vals
    cu_full = (b * sx) - fac_full
    cd_full = (b * sx) + fac_full
    c_center = a - 2.0 * b * sx - 2.0 * b * sy
    return cu_full, cd_full, c_center


_LANE_TILE = 128


def _lane_shift_matrices(dtype):
    """(T, U, L) 128x128 matrices expressing the lane-neighbor sum as banded
    matmuls: for lane tile j, ``left + right = X_{j-1} @ U + X_j @ T +
    X_{j+1} @ L`` (periodic wrap over the tiles). This is what makes bf16
    kernels possible — Mosaic cannot lane-rotate non-32-bit data
    (docs/BENCHMARKS.md round-3 experiments)."""
    T = np.zeros((_LANE_TILE, _LANE_TILE), np.float32)
    for i in range(_LANE_TILE - 1):
        T[i + 1, i] = 1.0  # contribution of the right neighbor
        T[i, i + 1] = 1.0  # contribution of the left neighbor
    # (matrices are f32 even for bf16 data: 0/1 values are exact either way)
    U = np.zeros((_LANE_TILE, _LANE_TILE), np.float32)
    U[_LANE_TILE - 1, 0] = 1.0
    L = np.zeros((_LANE_TILE, _LANE_TILE), np.float32)
    L[0, _LANE_TILE - 1] = 1.0
    return tuple(np.asarray(m, dtype) for m in (T, U, L))


def _mxu_lane_lr(center, T0j, Uj, Lj):
    """``left + right`` lane-neighbor sum via per-tile MXU matmuls.

    Precision (measured, docs/BENCHMARKS.md round-3 experiments): for bf16
    data the native MXU multiply is EXACT (0/1 matrices copy the inputs into
    an f32 accumulator) — and rolls cannot compile for bf16 at all, so this
    path is what makes bf16 storage work. For f32 data the default matmul
    precision rounds inputs to bf16 (maxdiff 5.7e-5 after 16 steps vs the
    roll formulation), so f32 uses this path only via the documented
    reduced-precision opt-in; Precision.HIGHEST would be exact but measured
    5x slower than the rolls."""
    n_cols = center.shape[1]
    nt = n_cols // _LANE_TILE
    tiles = [
        center[:, j * _LANE_TILE : (j + 1) * _LANE_TILE] for j in range(nt)
    ]
    out = []
    for j in range(nt):
        acc = jnp.dot(tiles[j], T0j, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            tiles[(j - 1) % nt], Uj, preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            tiles[(j + 1) % nt], Lj, preferred_element_type=jnp.float32
        )
        out.append(acc.astype(center.dtype))
    return jnp.concatenate(out, axis=1)


def _supports_fused_shape_2d(
    grid, dtype, k: int = 1, *, grid_cls=None, allow_bf16: bool = False
) -> bool:
    """Shape/backend preconditions shared by all 2D fused kernels.

    bf16 qualifies only where the kernel avoids lane rolls (Mosaic cannot
    rotate non-32-bit data): the MXU lane path of the single-field kernel
    with periodic columns, and the halo-extended column variants — callers
    that have such a path pass ``allow_bf16=True``.
    """
    if jax.default_backend() != "tpu":
        return False
    if grid_cls is None:
        grid_cls = CartesianGrid
    if not isinstance(grid, grid_cls) or grid.num_axes != 2:
        return False
    n_rows, n_cols = grid.shape
    if n_rows % 8 != 0 or n_cols % 128 != 0 or n_rows < 16:
        return False
    ok_dtypes = [np.dtype(np.float32)]
    if allow_bf16:
        ok_dtypes.append(np.dtype(jnp.bfloat16))
    if np.dtype(dtype) not in ok_dtypes:
        return False
    itemsize = np.dtype(dtype).itemsize
    if not _fused_geometry_ok(n_rows, n_cols, itemsize, k):
        return False
    # on the TPU path additionally require the band to dominate the temporal
    # block (halo DMA + recompute overhead stay a small fraction of the band)
    return _pick_band(n_rows, n_cols, itemsize, k) > 2 * k


def supports_affine_laplace(grid, dtype, k: int = 1) -> bool:
    """Check the preconditions of the fused kernel (fully periodic case)."""
    if _corner_weight() != 0.0 and k > _HALO:
        # the 9-point temporal block caps at one halo granule (see the
        # k-cap note in make_affine_laplace_2d)
        return False
    # fully periodic: bf16 works through the MXU lane path
    return _supports_fused_shape_2d(
        grid, dtype, k, allow_bf16=True
    ) and all(grid.periodic)


def affine_bc_params(grid, bcs):
    """Extract per-axis affine ghost-point parameters from boundary conditions.

    Returns a tuple with one entry per axis: ``None`` for a periodic axis, or
    ``((c, f1, f2), (c, f1, f2))`` for (low, high) where the ghost value is
    ``c + f1*edge + f2*next_inward`` — the virtual-point formulas of the
    reference's ConstBC classes (`/root/reference/pde/grids/boundaries/
    local.py:1541-2104`). Returns ``None`` when all axes are periodic. Raises
    :class:`PallasUnsupportedError` for BC types/values the fused kernels
    cannot lower (expression/user BCs, inhomogeneous arrays, complex values).
    """
    specs = affine_bc_specs(grid, bcs)
    if specs is None:
        return None
    return tuple(
        None
        if axis_specs is None
        else tuple(side.scalar_triplet() for side in axis_specs)
        for axis_specs in specs
    )


class _BCSideSpec:
    """Affine ghost-point data for one axis side, in the general form
    ``ghost = const_static + const_t(t) + f1*edge + f2*next_inward``
    (or ``ghost = const_xt(t) + f1*edge + f2*next_inward`` for expressions
    varying in both space and time).

    ``const_static`` is a scalar or a per-boundary-point array (the
    reference's virtual-point data is per-point arrays,
    `/root/reference/pde/grids/boundaries/local.py:1541-2104`);
    ``const_t`` is an optional traceable ``t -> scalar`` for time-dependent
    expression BCs; ``const_xt`` is an optional traceable ``t -> (n,)
    array`` for space-AND-time-dependent expression BCs (lowered as
    per-chunk ``(k, n)`` value tables by the stencil-helper kernels).
    ``f1``/``f2`` may be per-boundary-point arrays too (e.g. Robin with
    spatially varying gamma); the 2D stencil-helper kernels stage them
    like array consts, every other kernel rejects them (XLA fallback).
    ``f1_t`` is an optional traceable ``t -> scalar`` for TIME-dependent
    ghost coefficients (mixed BCs whose gamma varies in t): the
    stencil-helper kernels evaluate it into the same per-step SMEM table
    as ``const_t`` (``f1`` then holds the t=0 value for diagnostics and is
    never read by those kernels); the specialized affine kernels reject it.
    The reference compiles these through its per-point virtual-point data
    arrays, re-evaluated per step
    (`/root/reference/pde/grids/boundaries/local.py:1541-2104`).
    """

    __slots__ = ("f1", "f2", "const_static", "const_t", "const_xt", "f1_t")

    def __init__(self, f1, f2, const_static, const_t=None, const_xt=None,
                 f1_t=None):
        self.f1 = (
            float(f1) if np.ndim(f1) == 0 else np.asarray(f1, dtype=float)
        )
        self.f2 = (
            float(f2) if np.ndim(f2) == 0 else np.asarray(f2, dtype=float)
        )
        self.const_static = const_static
        self.const_t = const_t
        self.const_xt = const_xt
        self.f1_t = f1_t

    @property
    def is_scalar(self) -> bool:
        return (
            np.ndim(self.const_static) == 0
            and np.ndim(self.f1) == 0
            and np.ndim(self.f2) == 0
            and self.const_t is None
            and self.const_xt is None
            and self.f1_t is None
        )

    def scalar_triplet(self):
        """(const, f1, f2) floats; raises for array/time-dependent parts."""
        if not self.is_scalar:
            raise PallasUnsupportedError(
                "Inhomogeneous BC values are not supported by this kernel"
            )
        return float(self.const_static), self.f1, self.f2


def _uniform_scalar(value):
    """Collapse a uniform array to a float; None when truly inhomogeneous."""
    arr = np.asarray(value)
    if arr.ndim == 0:
        return float(arr)
    flat = arr.reshape(-1)
    if flat.size and np.all(flat == flat[0]):
        return float(flat[0])
    return None


def _expression_bc_spec(bc) -> _BCSideSpec:
    """Lower an ExpressionBC side (any target: value/derivative/mixed/
    virtual_point).

    Every target builds a ghost formula ``ghost = func(adjacent, dx, coords,
    t)``; the fused kernels need the AFFINE form ``ghost = const + f1*adj``.
    ``f1`` is extracted by differentiating the sympy expression w.r.t. the
    adjacent value (with ``dx`` substituted so e.g. the mixed target's
    ``(2 - gamma*dx)/(gamma*dx + 2)`` coefficient evaluates to a number,
    a per-point array for space-dependent gamma, or a per-step SMEM slot
    for t-dependent gamma); expressions nonlinear in the adjacent value,
    or whose coefficient varies in space AND time, fall back to XLA. The
    const is then just ``func(adjacent=0)``.
    """
    import sympy

    if bc.value_cell is not None or getattr(bc, "normal", False):
        raise PallasUnsupportedError(
            "value_cell/normal expression BCs are not supported in fused kernels"
        )
    expr = getattr(bc, "_expr", None)
    if expr is None:  # callable user function: dependence is unknowable
        raise PallasUnsupportedError(
            "Callable expression BCs are not supported in fused kernels"
        )
    value_sym = sympy.Symbol("value")
    t_sym = sympy.Symbol("t")
    axis_syms = {sympy.Symbol(ax) for ax in bc.grid.axes}
    dx_val = float(bc.grid.discretization[bc.axis])
    bc_coords = bc.grid._boundary_coordinates(bc.axis, bc.upper)
    coord_arrays = tuple(
        np.asarray(bc_coords[..., i]) for i in range(bc.grid.num_axes)
    )
    sexpr = expr._sympy_expr.subs(sympy.Symbol("dx"), sympy.Float(dx_val))
    dcoeff = sympy.diff(sexpr, value_sym)
    if dcoeff.free_symbols:
        dcoeff = sympy.simplify(dcoeff)
    f1_t = None
    if dcoeff.free_symbols == {t_sym}:
        # TIME-dependent ghost coefficient (mixed BC with gamma varying in
        # t): evaluated into the per-step SMEM table alongside const_t by
        # the stencil-helper kernels (reference: per-step re-evaluated
        # virtual-point factors, `local.py:1541-2104`). The SMEM table is
        # real-valued: reject coefficients with an imaginary part (e.g.
        # 'I*t*value') like the constant case below.
        if sympy.simplify(
            sympy.im(dcoeff.subs(t_sym, sympy.Symbol("t", real=True)))
        ) != 0:
            raise PallasUnsupportedError(
                "Complex adjacent-value coefficients are not supported in "
                "fused kernels"
            )
        fn = sympy.lambdify(t_sym, dcoeff, modules="jax")
        try:
            f1 = float(fn(0.0))
        except Exception as err:  # non-lowerable coefficient expression
            raise PallasUnsupportedError(
                f"Adjacent-value coefficient does not lower to jax: {err}"
            ) from err

        def f1_t(t, _fn=fn):
            return jnp.asarray(_fn(t))

    elif dcoeff.free_symbols and dcoeff.free_symbols <= axis_syms:
        # SPACE-only ghost coefficient (mixed BC with gamma varying along
        # the boundary): evaluate once on the boundary coordinates at
        # factory time — this is exactly the per-point ARRAY factor case
        # the stencil-helper kernels already stage (the reference compiles
        # these like any other virtual-point factor, `local.py:1781,2064`)
        syms = [sympy.Symbol(ax) for ax in bc.grid.axes]
        fn = sympy.lambdify(syms, dcoeff, modules="numpy")
        try:
            arr = np.asarray(fn(*coord_arrays))
        except Exception as err:
            raise PallasUnsupportedError(
                f"Adjacent-value coefficient does not lower to numpy: {err}"
            ) from err
        if np.iscomplexobj(arr):
            if np.any(np.imag(arr)):
                raise PallasUnsupportedError(
                    "Complex adjacent-value coefficients are not supported "
                    "in fused kernels"
                )
            arr = np.real(arr)
        arr = np.broadcast_to(
            arr.astype(float), coord_arrays[0].shape
        ).reshape(-1)
        scalar_f1 = _uniform_scalar(arr)
        f1 = scalar_f1 if scalar_f1 is not None else arr
    elif dcoeff.free_symbols or not sympy.im(dcoeff).is_zero:
        raise PallasUnsupportedError(
            "Expression BCs whose adjacent-value coefficient varies in "
            "time AND space (or is complex) are not supported in fused "
            "kernels"
        )
    else:
        f1 = float(dcoeff)
    const_expr = sympy.expand(sexpr - dcoeff * value_sym)
    if value_sym in const_expr.free_symbols:
        const_expr = sympy.simplify(const_expr)
    if value_sym in const_expr.free_symbols:
        raise PallasUnsupportedError(
            "Expression BCs nonlinear in the adjacent value are not supported"
        )
    free = {str(s) for s in const_expr.free_symbols}
    has_t = "t" in free
    has_coords = bool(free & set(bc.grid.axes))
    dx = float(bc.grid.discretization[bc.axis])
    func = bc._func
    if has_t and has_coords:
        # space-AND-time dependence: the const is a per-point array rebuilt
        # per step — lowered as per-chunk (k, n) FLAT value tables by the
        # stencil-helper kernels (the specialized affine kernels reject it;
        # 3D callers reshape the flat face back to its 2-D extent)
        face_shape = coord_arrays[0].shape
        jc = tuple(jnp.asarray(c) for c in coord_arrays)

        def const_xt(t, _f=func, _dx=dx, _c=jc, _shape=face_shape):
            val = _f(jnp.zeros(()), _dx, *_c, t)
            return jnp.broadcast_to(jnp.asarray(val), _shape).reshape(-1)

        return _BCSideSpec(f1, 0.0, 0.0, const_xt=const_xt, f1_t=f1_t)
    if has_t:
        zeros = tuple(np.zeros(()) for _ in coord_arrays)

        def const_t(t, _f=func, _dx=dx, _z=zeros):
            return _f(jnp.zeros(()), _dx, *_z, t)

        return _BCSideSpec(f1, 0.0, 0.0, const_t, f1_t=f1_t)
    const = np.asarray(func(np.zeros(()), dx, *coord_arrays, 0.0), dtype=float)
    scalar = _uniform_scalar(const)
    return _BCSideSpec(
        f1, 0.0, scalar if scalar is not None else const, f1_t=f1_t
    )


def affine_bc_specs(grid, bcs):
    """Generalized per-axis affine ghost specs (arrays + time dependence).

    Like :func:`affine_bc_params` but returns :class:`_BCSideSpec` pairs,
    additionally accepting inhomogeneous (per-boundary-point array) const
    values and time-dependent expression BCs of any target (value/
    derivative/mixed/virtual_point) whose adjacent-value coefficient is a
    constant. Returns ``None`` when fully periodic.
    """
    from ..grids.boundaries.local import (
        ConstBC1stOrderBase,
        ConstBC2ndOrderBase,
        ExpressionBC,
    )

    params = []
    for ax, pair in enumerate(bcs):
        if pair.periodic:
            if getattr(pair.low, "flip_sign", False):
                raise PallasUnsupportedError(
                    "Anti-periodic BCs are not supported in fused kernels"
                )
            params.append(None)
            continue
        edge_lo, edge_hi = 0, grid.shape[ax] - 1
        sides = []
        for bc in (pair.low, pair.high):
            edge = edge_hi if bc.upper else edge_lo
            inward = -1 if bc.upper else 1
            if getattr(bc, "normal", False):
                raise PallasUnsupportedError(
                    "Normal-component BCs are not supported in fused kernels"
                )
            if isinstance(bc, ExpressionBC):
                sides.append(_expression_bc_spec(bc))
                continue
            if isinstance(bc, ConstBC1stOrderBase):
                const, f1, idx = bc.get_virtual_point_data()
                f2, idx2 = 0.0, edge + inward
            elif isinstance(bc, ConstBC2ndOrderBase):
                const, f1, idx, f2, idx2 = bc.get_virtual_point_data()
            else:
                raise PallasUnsupportedError(
                    f"BC type {type(bc).__name__} is not supported in fused kernels"
                )
            for v in (const, f1, f2):
                if np.iscomplexobj(v):
                    raise PallasUnsupportedError(
                        "Complex BC values are not supported in fused kernels"
                    )
            f1s = _uniform_scalar(f1)
            f2s = _uniform_scalar(f2)
            if idx != edge or idx2 != edge + inward:
                raise PallasUnsupportedError("Unexpected virtual-point layout")
            cs = _uniform_scalar(const)
            sides.append(
                _BCSideSpec(
                    f1s if f1s is not None else np.asarray(f1, dtype=float),
                    f2s if f2s is not None else np.asarray(f2, dtype=float),
                    cs if cs is not None else np.asarray(const, dtype=float),
                )
            )
        params.append(tuple(sides))
    if all(p is None for p in params):
        return None
    return tuple(params)


def collect_bc_side_inputs(bc_table):
    """Gather array-valued / t-dependent sides from a table of per-axis
    :func:`affine_bc_specs` tuples (2D: axis 0 = rows, axis 1 = columns).

    Returns ``None`` when every const is a plain scalar (the kernels then
    need no side inputs), else ``{"arrays": [('row'|'col', spec), ...],
    "t": [(spec, 'const_t'|'f1_t'), ...], "xt": [('row'|'col', spec), ...],
    "factors": [('row'|'col', spec, 'f1'|'f2'), ...]}`` with each distinct
    :class:`_BCSideSpec` appearing once (the expression compiler
    resolves BCs per ``(var, operator)``, so the same side may carry
    several independent spec objects — each gets its own staged slot).
    ``xt`` entries are space-AND-time-dependent consts, lowered as
    per-chunk ``(k, n)`` value tables; ``factors`` are per-point
    ghost-formula coefficients (Robin with array gamma), staged like
    array consts; ``t`` slots are scalar ``t -> value`` functions (consts
    AND ghost coefficients) evaluated into one per-step SMEM table.
    """
    arrays: list = []
    t_slots: list = []
    xt: list = []
    factors: list = []
    seen: set = set()
    for specs in bc_table.values():
        if specs is None:
            continue
        for ax, pair in enumerate(specs):
            if pair is None:
                continue
            for spec in pair:
                if id(spec) in seen:
                    continue
                seen.add(id(spec))
                kind = "row" if ax == 0 else "col"
                for attr in ("f1", "f2"):
                    if np.ndim(getattr(spec, attr)) != 0:
                        factors.append((kind, spec, attr))
                if spec.f1_t is not None:
                    t_slots.append((spec, "f1_t"))
                if spec.const_xt is not None:
                    xt.append((kind, spec))
                    continue
                if np.ndim(spec.const_static) != 0:
                    arrays.append((kind, spec))
                if spec.const_t is not None:
                    t_slots.append((spec, "const_t"))
    if not arrays and not t_slots and not xt and not factors:
        return None
    return {"arrays": arrays, "t": t_slots, "xt": xt, "factors": factors}


def collect_bc_side_inputs_3d(bc_table):
    """3D variant of :func:`collect_bc_side_inputs`: kinds are axis indices.

    Returns ``None`` when every const is scalar, else ``{"arrays":
    [(ax, spec, attr), ...], "t": [spec, ...], "xt": [(ax, spec), ...]}``
    with attr ``"const_static"``/``"f1"``/``"f2"`` (per-face value arrays
    AND array-valued Robin factors stage identically). Staging layouts
    (see :func:`make_fused_multi_stencil_window_3d`): x-side arrays are
    one ``(1, ny, nz)`` VMEM plane; y-side arrays a per-program
    ``(band + 2*halo, 1, nz)`` DMA slice of an x-wrap-padded block; z-side
    arrays a ``(band + 2*halo, ny, 128)`` slice of a lane-broadcast block
    (value in lane 0 — Mosaic rejects width-1 memref slices). ``xt``
    entries are space-AND-time values lowered as per-chunk step-indexed
    tables (one extra leading ``k`` dim on each layout).
    """
    arrays: list = []
    t_slots: list = []
    xt: list = []
    seen: set = set()
    for specs in bc_table.values():
        if specs is None:
            continue
        for ax, pair in enumerate(specs):
            if pair is None:
                continue
            for spec in pair:
                if id(spec) in seen:
                    continue
                seen.add(id(spec))
                for attr in ("f1", "f2"):
                    if np.ndim(getattr(spec, attr)) != 0:
                        arrays.append((ax, spec, attr))
                if spec.f1_t is not None:
                    t_slots.append((spec, "f1_t"))
                if spec.const_xt is not None:
                    xt.append((ax, spec))
                    continue
                if np.ndim(spec.const_static) != 0:
                    arrays.append((ax, spec, "const_static"))
                if spec.const_t is not None:
                    t_slots.append((spec, "const_t"))
    if not arrays and not t_slots and not xt:
        return None
    return {"arrays": arrays, "t": t_slots, "xt": xt}


def _t_slot_funcs(t_slots):
    """Per-slot scalar ``t -> value`` functions for the per-step SMEM
    table (column order = the ``bc_inputs["t"]`` slot order)."""
    return [getattr(spec, attr) for spec, attr in t_slots]


def _set_t_slots(helpers, t_slots, t_tab, s):
    """Bind step ``s``'s row of the SMEM t-table into the stencil helpers:
    const slots feed ``helpers.t_consts[id(spec)]`` (added to the ghost
    const), factor slots feed ``helpers.t_factors[(id(spec), 'f1')]``
    (replacing the adjacent-value coefficient)."""
    consts: dict = {}
    factors: dict = {}
    for j, (spec, attr) in enumerate(t_slots):
        if attr == "const_t":
            consts[id(spec)] = t_tab[s, j]
        else:
            factors[(id(spec), "f1")] = t_tab[s, j]
    helpers.t_consts = consts
    helpers.t_factors = factors


def _specs_have_xt(specs) -> bool:
    """True when any side carries a space-AND-time-dependent const (only
    the stencil-helper kernels lower those; the specialized affine kernels
    reject them)."""
    if specs is None:
        return False
    return any(
        side.const_xt is not None
        for pair in specs
        if pair is not None
        for side in pair
    )


def _specs_have_array_factors(specs) -> bool:
    """True when any side carries per-point ghost-formula coefficients
    (only the 2D stencil-helper kernels stage those)."""
    if specs is None:
        return False
    return any(
        np.ndim(side.f1) != 0 or np.ndim(side.f2) != 0
        for pair in specs
        if pair is not None
        for side in pair
    )


def _specs_have_t_factors(specs) -> bool:
    """True when any side carries a TIME-dependent ghost coefficient
    (mixed gamma varying in t; only the stencil-helper kernels evaluate
    those into the per-step SMEM table)."""
    if specs is None:
        return False
    return any(
        side.f1_t is not None
        for pair in specs
        if pair is not None
        for side in pair
    )


def supports_affine_laplace_bc(grid, bcs, dtype, k: int = 1) -> bool:
    """Preconditions of the fused kernel with physical (const-affine) BCs
    (incl. inhomogeneous arrays and t-dependent expression values)."""
    try:
        specs = affine_bc_specs(grid, bcs)
    except PallasUnsupportedError:
        return False
    if (
        _specs_have_xt(specs)
        or _specs_have_array_factors(specs)
        or _specs_have_t_factors(specs)
    ):
        return False
    # bf16 needs the MXU lane path, which requires periodic columns
    cols_periodic = specs is None or (len(specs) > 1 and specs[1] is None)
    return _supports_fused_shape_2d(grid, dtype, k, allow_bf16=cols_periodic)


def make_affine_laplace_2d(
    grid, *, a: float = 0.0, b: float = 1.0, k: int = 1,
    dtype=np.float32, bcs=None, interpret: bool = False, radial=None,
) -> Callable:
    """Return ``f -> (a*I + b*lap)^k f`` as one fused kernel.

    Without ``bcs`` the grid must be fully periodic. With ``bcs``, axes may
    instead carry const-affine physical BCs (Dirichlet/Neumann/Robin/
    Curvature): their first/second-order virtual-point formulas (reference
    `local.py:1541-2104`) are lowered into the kernel as edge fixups — edge
    programs overwrite the ghost row each step (the BC must be re-applied at
    every intermediate time level of the temporal block), and non-periodic
    columns patch lanes 0/m-1 after the rolls.

    Inhomogeneous (per-boundary-point array) const values stage as VMEM side
    inputs: row-side arrays as one (1, n_cols) block, column-side arrays as a
    per-program (band + 2*halo, 1) DMA slice of the halo-extended value
    vector — the reference's per-point virtual-point arrays sitting in VMEM
    as per-lane vectors (`local.py:1541-2104`). Time-dependent expression BCs
    (`value_expression`/`derivative_expression` of ``t`` only) pass per-step
    scalars through an SMEM table; the returned callable then has signature
    ``affine_laplace(data, t_tab)`` with ``t_tab`` of shape (k, 4) holding
    the additive const for [row_lo, row_hi, col_lo, col_hi] at each step
    (exposed via attribute ``t_slots``).

    ``radial=(r_lo, dr_r)`` adds the cylindrical first-derivative term
    ``b/(2 r dr) * (f[r+1] - f[r-1])`` with ``r = r_lo + (row + 0.5) dr_r``:
    rows map to the radial axis and the per-row factor is computed in-kernel
    from the global row index (one tiny (rows, 1) block per program, no extra
    HBM traffic). This lowers CylindricalSymGrid Laplacians — the reference
    compiles these loops with numba (`operators/cylindrical_sym.py:32`) but
    has no fused/temporal-blocked equivalent.

    The configured 9-point corner-weight Laplacian
    (``operators.cartesian.laplacian_2d_corner_weight``, reference
    `backends/numba/operators/cartesian.py:109-192`) lowers on fully
    periodic grids: the diagonal neighbors come from row-slices of the SAME
    two lane rolls the 5-point stencil already pays (roll the whole work
    region instead of its center rows), so the extra cost is adds/multiplies
    only. Physical BCs with the 9-point stencil need the corner-ghost
    extrapolation (`ops/cartesian.py:_set_corner_points_2d`) and fall back
    to XLA, matching the ETDRK spectral-split restriction.
    """
    corner_w = _corner_weight()
    if radial is not None:
        # cylindrical stencils ignore the 2D-cartesian corner-weight key
        # (round-3 advisor finding): keep the radial 5-point lowering
        corner_w = 0.0
    if corner_w != 0.0 and (
        bcs is not None
        or not all(grid.periodic)
        or np.dtype(dtype) == np.dtype(jnp.bfloat16)
    ):
        raise PallasUnsupportedError(
            "The fused 9-point corner-weight Laplacian requires a fully "
            "periodic 2D Cartesian grid with float32 data"
        )
    if corner_w != 0.0 and k > _HALO:
        # cap the 9-point temporal block at one halo granule: XLA:CPU
        # rounds the lap9 expression SHAPE-dependently for deeper work
        # regions (k=16 differs from two k=8 windows by 1 ulp on rare
        # cells — measured, round 5), which would break chunk consistency
        # and the sharded-vs-serial bit-identity invariant (the ext kernel
        # caps at k=8 already). The probing callers halve k on this error.
        raise PallasUnsupportedError(
            "The fused 9-point corner-weight Laplacian caps the temporal "
            f"block at k={_HALO}"
        )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bc_specs = None if bcs is None else affine_bc_specs(grid, bcs)
    if _specs_have_xt(bc_specs):
        raise PallasUnsupportedError(
            "Space-and-time-dependent BC values are not supported by the "
            "affine kernel (the expression-compiled windows lower them)"
        )
    if _specs_have_array_factors(bc_specs):
        raise PallasUnsupportedError(
            "Array-valued BC factors are not supported by the affine "
            "kernel (the expression-compiled windows stage them)"
        )
    if bcs is None and not all(grid.periodic):
        raise PallasUnsupportedError(
            "Non-periodic grids require explicit boundary conditions"
        )
    if interpret:
        if grid.num_axes != 2 or (
            radial is None and not isinstance(grid, CartesianGrid)
        ):
            raise PallasUnsupportedError("2D Cartesian grid required")
        n_r, n_c = grid.shape
        if not _fused_geometry_ok(n_r, n_c, np.dtype(dtype).itemsize, k):
            raise PallasUnsupportedError(
                "Grid too small for the k-step band/halo geometry"
            )
    elif not _supports_fused_shape_2d(
        grid, dtype, k,
        grid_cls=object if radial is not None else CartesianGrid,
        # bf16 requires the MXU lane path, i.e. periodic columns
        allow_bf16=bc_specs is None
        or (len(bc_specs) > 1 and bc_specs[1] is None),
    ):
        raise PallasUnsupportedError(
            "Fused Pallas laplace requires a 2D grid with aligned "
            "shape and float32/bfloat16 data on a TPU backend"
        )
    n_rows, n_cols = grid.shape
    itemsize = np.dtype(dtype).itemsize
    # single-field FIXUP-FREE kernel: the raised budget picks band 512 at
    # 4096² f32 (measured +6% over band 128 — round-5 sweep,
    # docs/BENCHMARKS.md). BC-fixup variants keep the default budget:
    # their per-step ghost rewrites × k=16 × a 2688-row work region blew up
    # the Mosaic compile (three attempts wedged >10 min on silicon), and no
    # band-512 win is measured for them.
    band_budget = (
        _VMEM_BUDGET_AFFINE
        if bc_specs is None and radial is None and corner_w == 0.0
        else _VMEM_BUDGET
    )
    band = _pick_band(n_rows, n_cols, itemsize, k, budget=band_budget)
    n_programs = n_rows // band
    halo = -(-k // _HALO) * _HALO  # k rounded up to the 8-row DMA granule
    sx, sy = (1.0 / grid.discretization**2).tolist()
    bc_rows = None if bc_specs is None else bc_specs[0]
    bc_cols = None if bc_specs is None else bc_specs[1]

    # -- side-input assembly for inhomogeneous / time-dependent consts ---------
    # slots: 0 = row low, 1 = row high, 2 = col low, 3 = col high
    row_arrays: list[np.ndarray] = []  # (1, n_cols) blocks
    col_arrays: list[np.ndarray] = []  # (n_rows + 2*halo, 1) extended vectors
    row_slot_arr = {}  # slot -> index into row_arrays
    col_slot_arr = {}  # slot -> index into col_arrays
    t_slots: list = [None, None, None, None]

    def _register(slot, spec):
        if spec is None:
            return
        if np.ndim(spec.const_static) != 0:
            arr = np.asarray(spec.const_static, dtype=dtype).reshape(-1)
            if slot < 2:  # row side: varies along columns
                row_slot_arr[slot] = len(row_arrays)
                row_arrays.append(arr.reshape(1, n_cols))
            else:  # column side: varies along rows; extend for halo wrap.
                # Mosaic rejects width-1 memref slices, so the vector is
                # broadcast across one 128-lane tile in HBM; the kernel
                # loads the block and value-slices lane 0 (a vector op)
                ext = np.concatenate([arr[-halo:], arr, arr[:halo]])
                col_slot_arr[slot] = len(col_arrays)
                col_arrays.append(
                    np.broadcast_to(ext.reshape(-1, 1), (ext.size, 128)).copy()
                )
        if spec.const_t is not None:
            t_slots[slot] = spec.const_t
        if spec.f1_t is not None:
            # the slot table holds additive consts only; a t-dependent
            # ghost COEFFICIENT needs the stencil-helper kernels
            raise PallasUnsupportedError(
                "Time-dependent BC coefficients are not supported by the "
                "specialized affine kernel"
            )

    if bc_rows is not None:
        _register(0, bc_rows[0])
        _register(1, bc_rows[1])
    if bc_cols is not None:
        _register(2, bc_cols[0])
        _register(3, bc_cols[1])
    has_t = any(f is not None for f in t_slots)
    n_row_in = len(row_arrays)
    n_col_in = len(col_arrays)
    # lane-neighbor sum on the MXU for periodic columns: bf16 only — rolls
    # cannot compile for bf16 (Mosaic 32-bit rotate), and the MXU lane sums
    # are EXACT for bf16 inputs. For f32 the MXU variant measured a wash
    # (1.61e11 vs 1.59e11 updates/s at 4096²) at REDUCED precision (inputs
    # round to bf16 in the matmuls), so f32 keeps the rolls — see
    # docs/BENCHMARKS.md round-3 experiments.
    use_mxu = (
        not interpret
        and bc_cols is None
        and n_cols % _LANE_TILE == 0
        and np.dtype(dtype) == np.dtype(jnp.bfloat16)
    )

    def kernel(*refs):
        pos = 0
        if has_t:
            t_tab = refs[pos]
            pos += 1
        if use_mxu:
            mxu_mats = tuple(r[:, :] for r in refs[pos : pos + 3])
            pos += 3
        row_refs = refs[pos : pos + n_row_in]
        pos += n_row_in
        col_hbm = refs[pos : pos + n_col_in]
        pos += n_col_in
        f_hbm = refs[pos]
        out_ref = refs[pos + 1]
        band_ref, halo_top, halo_bot = refs[pos + 2 : pos + 5]
        col_vmem = refs[pos + 5 : pos + 5 + n_col_in]
        sem = refs[pos + 5 + n_col_in]

        i = pl.program_id(0)
        row0 = i * band

        main = pltpu.make_async_copy(
            f_hbm.at[pl.ds(pl.multiple_of(row0, 8), band), :], band_ref, sem.at[0]
        )
        main.start()
        # for non-periodic rows the wrapped halo reads are garbage-but-finite
        # on the edge programs; the per-step ghost fixups below mask them
        top_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(n_rows - halo), np.int32(n_rows)), 8
        )
        top = pltpu.make_async_copy(
            f_hbm.at[pl.ds(top_row, halo), :], halo_top, sem.at[1]
        )
        top.start()
        bot_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(band), np.int32(n_rows)), 8
        )
        bot = pltpu.make_async_copy(
            f_hbm.at[pl.ds(bot_row, halo), :], halo_bot, sem.at[2]
        )
        bot.start()
        copies = [main, top, bot]
        for j in range(n_col_in):
            # the column-BC value vector rows matching this program's block
            cp = pltpu.make_async_copy(
                col_hbm[j].at[pl.ds(pl.multiple_of(row0, 8), band + 2 * halo), :],
                col_vmem[j],
                sem.at[3 + j],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        def const_for(slot, s, col_rows=None):
            """Additive ghost const for `slot` at step `s` (scalar or array).

            ``col_rows`` selects the value-vector rows matching the CURRENT
            (shrinking) center rows for column sides."""
            spec = (bc_rows if slot < 2 else bc_cols)[slot % 2]
            if np.ndim(spec.const_static) == 0:
                c = spec.const_static
            elif slot < 2:
                c = row_refs[row_slot_arr[slot]][0:1, :]
            else:
                c = col_vmem[col_slot_arr[slot]][col_rows][:, 0:1]
            if t_slots[slot] is not None:
                c = c + t_tab[s, slot]
            return c

        # work region: band plus k halo rows on each side; each of the k steps
        # shrinks the valid region by one row per side
        work = jnp.concatenate(
            [halo_top[halo - k :, :], band_ref[:, :], halo_bot[:k, :]], axis=0
        )
        if radial is not None:
            # per-row cylindrical coefficients over the work-region rows
            # [row0-k, row0+band+k), once per program (see _radial_row_coeffs)
            cu_full, cd_full, c_center = _radial_row_coeffs(
                radial, a, b, sx, sy, dtype, row0 - np.int32(k), band + 2 * k
            )
        isotropic = sx == sy
        for s in range(k):
            if bc_rows is not None:
                # ghost rows at the global domain edges (programs 0 / last):
                # at step s the first valid row of program 0 is k-s (global
                # row 0); its ghost row k-s-1 gets the virtual-point value
                lo, hi = bc_rows
                e_lo = k - s
                ghost_lo = const_for(0, s) + lo.f1 * work[e_lo : e_lo + 1, :]
                if lo.f2:
                    ghost_lo = ghost_lo + lo.f2 * work[e_lo + 1 : e_lo + 2, :]
                e_hi = band + k - s - 1
                ghost_hi = const_for(1, s) + hi.f1 * work[e_hi : e_hi + 1, :]
                if hi.f2:
                    ghost_hi = ghost_hi + hi.f2 * work[e_hi - 1 : e_hi, :]
                rows = jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
                work = jnp.where((rows == e_lo - 1) & (i == 0), ghost_lo, work)
                work = jnp.where(
                    (rows == e_hi + 1) & (i == n_programs - 1), ghost_hi, work
                )
            if corner_w != 0.0:
                # 9-point corner-weight stencil (w=1/2 Oono-Puri, w=1/3
                # Patra-Karttunen; ref numba/operators/cartesian.py:109-192):
                # roll the WHOLE work region so the diagonal neighbors are
                # row-slices of the same two lane rolls the 5-point form
                # pays — no extra lane relayouts, only adds/multiplies.
                # The temporal block is capped at k <= _HALO for this
                # stencil (gate below): XLA:CPU rounds this expression
                # SHAPE-dependently at deeper work regions (k=16's 48-row
                # window differs from two k=8 windows by 1 ulp on rare
                # cells — measured, round 5), which would break chunk
                # consistency and the sharded-vs-serial bit-identity
                # invariant. Keep the ext-kernel branches
                # (make_affine_laplace_ext_2d) term-for-term identical.
                lroll = pltpu.roll(work, 1, 1)
                rroll = pltpu.roll(work, n_cols - 1, 1)
                center = work[1:-1, :]
                dm2 = sx + sy
                lap9 = (
                    ((1.0 - corner_w) * sx) * (work[:-2, :] + work[2:, :])
                    + ((1.0 - corner_w) * sy)
                    * (lroll[1:-1, :] + rroll[1:-1, :])
                    + (0.25 * corner_w * dm2)
                    * (
                        lroll[:-2, :]
                        + lroll[2:, :]
                        + rroll[:-2, :]
                        + rroll[2:, :]
                    )
                    + ((corner_w - 2.0) * dm2) * center
                )
                work = a * center + b * lap9
                continue
            up = work[:-2, :]
            center = work[1:-1, :]
            down = work[2:, :]
            if use_mxu:
                # lane-neighbor sum on the MXU (periodic columns)
                lr = _mxu_lane_lr(center, *mxu_mats)
            else:
                left = pltpu.roll(center, 1, 1)
                right = pltpu.roll(center, n_cols - 1, 1)
                if bc_cols is not None:
                    # patch the wrapped lanes: at lane 0 the left neighbor is
                    # the ghost value; raw rolls provide the inward neighbors
                    # (right[:,0] = center[:,1], left[:,m-1] = center[:,m-2]).
                    # center rows span global [row0-(k-s)+1,
                    # row0+band+(k-s)-1): slice the matching value-vector
                    # rows (VMEM index of global row g is g - row0 + halo)
                    lo, hi = bc_cols
                    col_rows = slice(
                        halo - (k - s) + 1, halo + band + (k - s) - 1
                    )
                    ghost_lo = const_for(2, s, col_rows) + lo.f1 * center
                    if lo.f2:
                        ghost_lo = ghost_lo + lo.f2 * right
                    ghost_hi = const_for(3, s, col_rows) + hi.f1 * center
                    if hi.f2:
                        ghost_hi = ghost_hi + hi.f2 * left
                    lanes = jax.lax.broadcasted_iota(
                        jnp.int32, center.shape, 1
                    )
                    left = jnp.where(lanes == 0, ghost_lo, left)
                    right = jnp.where(lanes == n_cols - 1, ghost_hi, right)
                # NOTE: do NOT materialize `left + right` here — an explicit
                # intermediate breaks Mosaic's fusion of the rolls into the
                # add chain (measured 1.18e11 vs 1.57e11 updates/s at 4096²)
                lr = None
            if radial is not None:
                # cylindrical: per-row coefficients carry the (1/r) d/dr
                # term; rows shrink with the trapezoid
                sl = slice(s + 1, band + 2 * k - s - 1)
                work = (
                    cu_full[sl] * up
                    + cd_full[sl] * down
                    + (b * sy) * (lr if use_mxu else left + right)
                    + c_center * center
                )
            elif isotropic:
                # fold the scale into b: fewer VPU ops in this compute-bound loop
                if use_mxu:
                    lap4 = up + down + lr - 4.0 * center
                else:
                    lap4 = up + down + left + right - 4.0 * center
                work = a * center + (b * sx) * lap4
            else:
                lane_part = (
                    (lr - 2.0 * center) if use_mxu
                    else (left + right - 2.0 * center)
                )
                lap = (up + down - 2.0 * center) * sx + lane_part * sy
                work = a * center + b * lap
        out_ref[:, :] = work

    in_specs = (
        ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
        + [
            pl.BlockSpec(
                (_LANE_TILE, _LANE_TILE),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * (3 if use_mxu else 0)
        + [
            pl.BlockSpec(
                (1, n_cols), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ] * n_row_in
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_col_in
        + [pl.BlockSpec(memory_space=pl.ANY)]
    )
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        grid=(n_rows // band,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, n_cols), dtype),
            pltpu.VMEM((halo, n_cols), dtype),
            pltpu.VMEM((halo, n_cols), dtype),
        ]
        + [pltpu.VMEM((band + 2 * halo, 128), dtype)] * n_col_in
        + [pltpu.SemaphoreType.DMA((3 + n_col_in,))],
        interpret=interpret,
        vmem_footprint=_band_footprint(band, n_cols, itemsize, k),
    )

    row_consts = [jnp.asarray(arr, dtype=dtype) for arr in row_arrays]
    col_consts = [jnp.asarray(arr, dtype=dtype) for arr in col_arrays]
    mxu_consts = (
        [jnp.asarray(m) for m in _lane_shift_matrices(dtype)]
        if use_mxu
        else []
    )

    if has_t:

        def affine_laplace_t(data, t_tab):
            return call(
                jnp.asarray(t_tab, dtype=dtype), *mxu_consts, *row_consts,
                *col_consts, jnp.asarray(data, dtype=dtype),
            )

        affine_laplace_t.t_slots = tuple(t_slots)
        affine_laplace_t.k = k
        return affine_laplace_t

    def affine_laplace(data):
        return call(
            *mxu_consts, *row_consts, *col_consts,
            jnp.asarray(data, dtype=dtype),
        )

    affine_laplace.t_slots = None
    affine_laplace.k = k
    return affine_laplace


def make_laplace_pallas(
    grid, bcs=None, *, dtype=np.float32, interpret: bool = False,
) -> Callable:
    """Pallas-lowered plain laplace operator (2D Cartesian/cylindrical grids).

    Periodic and const-affine BCs (value/derivative/mixed/curvature, incl.
    inhomogeneous array values and t-dependent expressions) are lowered into
    the kernel; other BC types raise PallasUnsupportedError. The returned
    callable has the standard operator signature ``op(data, t=0.0,
    args=None)`` (`reference grids/base.py:1198`).
    """
    from ..grids.cylindrical import CylindricalSymGrid

    if isinstance(grid, CylindricalSymGrid):
        radial = (float(grid.axes_bounds[0][0]), float(grid.discretization[0]))
    else:
        radial = None
    op = make_affine_laplace_2d(
        grid, a=0.0, b=1.0, k=1, dtype=dtype, bcs=bcs, interpret=interpret,
        radial=radial,
    )

    if op.t_slots is not None:
        # t-dependent expression BCs: build the (1, 4) SMEM const table
        t_funcs = op.t_slots

        def laplace_t(data, t=0.0, args=None):
            ts = jnp.atleast_1d(jnp.asarray(t, dtype=dtype))
            cols = [
                jnp.zeros_like(ts) if fn is None else jax.vmap(fn)(ts)
                for fn in t_funcs
            ]
            return op(data, jnp.stack(cols, axis=1))

        return laplace_t

    def laplace(data, t=0.0, args=None):
        return op(data)

    return laplace


#: standalone-operator builders: name -> (n_in, n_out, needs_default_lap,
#: build(helpers, bc) -> fn(works) -> outs); every out shrinks one row per
#: side (the kernel geometry), columns handled by the helpers' lane rolls
_STENCIL_OP_BUILDERS: dict[str, tuple] = {
    "gradient_squared": (
        1, 1,
        False,
        lambda h, bc: lambda w: [h.gradient_squared(w[0], bc=bc)],
    ),
    "gradient": (
        1, 2,
        False,
        lambda h, bc: lambda w: [h.d_row(w[0], bc=bc), h.d_col(w[0], bc=bc)],
    ),
    "divergence": (
        2, 1,
        False,
        lambda h, bc: lambda w: [
            h.d_row(w[0], bc=bc) + h.d_col(w[1], bc=bc)
        ],
    ),
    "vector_laplace": (
        2, 2,
        True,
        lambda h, bc: lambda w: [h.lap(w[0], bc=bc), h.lap(w[1], bc=bc)],
    ),
    # out[i, j] = d_j v_i, flattened row-major (reference
    # `backends/numba/operators/cartesian.py:1026`)
    "vector_gradient": (
        2, 4,
        False,
        lambda h, bc: lambda w: [
            h.d_row(w[0], bc=bc), h.d_col(w[0], bc=bc),
            h.d_row(w[1], bc=bc), h.d_col(w[1], bc=bc),
        ],
    ),
    # out[i] = sum_j d_j t_ij with t flattened row-major (reference
    # `backends/numba/operators/cartesian.py:1076`)
    "tensor_divergence": (
        4, 2,
        False,
        lambda h, bc: lambda w: [
            h.d_row(w[0], bc=bc) + h.d_col(w[1], bc=bc),
            h.d_row(w[2], bc=bc) + h.d_col(w[3], bc=bc),
        ],
    ),
}

#: rank-2 outputs reshape their stacked planes back to tensor axes
_STENCIL_OP_OUT_PREFIX: dict[str, tuple[int, ...]] = {
    "vector_gradient": (2, 2),
}


def make_stencil_op_pallas(
    grid, bcs=None, *, op_name: str, dtype=np.float32,
    interpret: bool = False,
) -> Callable:
    """Single-application Pallas lowering of a first-order stencil operator
    (2D Cartesian grids): gradient, gradient_squared, divergence,
    vector_laplace, vector_gradient, tensor_divergence — the
    `backend="pallas"` operator registry entries beyond laplace (which has
    its own temporally-blockable kernel, :func:`make_laplace_pallas`).

    One banded pass: per program, 3 DMAs per input plane (band + two 8-row
    halos), the helpers' stencil primitives with affine ghost fixups, one
    write per output plane. Scalar-affine BCs only — array/t-dependent
    values raise ``PallasUnsupportedError`` (the solver-level fused windows
    stage those; a standalone operator call re-stages per call, which is
    exactly the HBM traffic this kernel exists to avoid). Returned callable
    has the standard operator signature ``op(data, t=0.0, args=None)``
    (reference `grids/base.py:1198`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if op_name not in _STENCIL_OP_BUILDERS:
        raise PallasUnsupportedError(
            f"No Pallas kernel for operator {op_name!r}"
        )
    n_in, n_out, needs_lap, build = _STENCIL_OP_BUILDERS[op_name]
    if not isinstance(grid, CartesianGrid) or grid.num_axes != 2:
        raise PallasUnsupportedError("2D Cartesian grid required")
    if needs_lap:
        _require_default_laplace_stencil()
    n_rows, n_cols = grid.shape
    itemsize = np.dtype(dtype).itemsize
    if interpret:
        if not _fused_geometry_ok(n_rows, n_cols * n_in, itemsize, 1):
            raise PallasUnsupportedError("Grid too small for the band geometry")
    elif not _supports_fused_shape_2d(grid, dtype, 1):
        raise PallasUnsupportedError(
            "Pallas operators require an aligned 2D grid with float32 data "
            "on a TPU backend"
        )
    specs = None if all(grid.periodic) else affine_bc_specs(grid, bcs)
    if specs is not None and collect_bc_side_inputs({("c", op_name): specs}):
        raise PallasUnsupportedError(
            "Array/time-dependent BC values are not supported by the "
            "standalone Pallas operators"
        )
    band = _pick_band(n_rows, n_cols * n_in, itemsize, 1)
    helpers = _make_stencil_helpers(grid, pl, pltpu, band, n_rows // band)
    bc = None if specs is None else (specs[0], specs[1])
    fn = build(helpers, bc)
    halo = _HALO

    def kernel(*refs):
        ins = refs[:n_in]
        outs = refs[n_in : n_in + n_out]
        scratch = refs[n_in + n_out :]
        bands = scratch[:n_in]
        tops = scratch[n_in : 2 * n_in]
        bots = scratch[2 * n_in : 3 * n_in]
        sem = scratch[3 * n_in]
        i = pl.program_id(0)
        row0 = i * band
        top_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(n_rows - halo), np.int32(n_rows)), 8
        )
        bot_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(band), np.int32(n_rows)), 8
        )
        copies = []
        for f in range(n_in):
            for src, dst in (
                (ins[f].at[pl.ds(pl.multiple_of(row0, 8), band), :], bands[f]),
                (ins[f].at[pl.ds(top_row, halo), :], tops[f]),
                (ins[f].at[pl.ds(bot_row, halo), :], bots[f]),
            ):
                cp = pltpu.make_async_copy(src, dst, sem.at[len(copies)])
                cp.start()
                copies.append(cp)
        for cp in copies:
            cp.wait()
        works = [
            jnp.concatenate(
                [tops[f][halo - 1 :, :], bands[f][:, :], bots[f][:1, :]],
                axis=0,
            )
            for f in range(n_in)
        ]
        for out_ref, val in zip(outs, fn(works)):
            out_ref[:, :] = val

    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_rows, n_cols), dtype)] * n_out,
        grid=(n_rows // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[
            pl.BlockSpec(
                (band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ] * n_out,
        scratch_shapes=[pltpu.VMEM((band, n_cols), dtype)] * n_in
        + [pltpu.VMEM((halo, n_cols), dtype)] * (2 * n_in)
        + [pltpu.SemaphoreType.DMA((3 * n_in,))],
        interpret=interpret,
    )

    out_prefix = _STENCIL_OP_OUT_PREFIX.get(op_name)

    def op(data, t=0.0, args=None):
        data = jnp.asarray(data, dtype=dtype)
        if n_in == 1:
            planes = [data]
        else:  # rank-1/2 inputs flatten to component planes (row-major)
            flat = data.reshape((n_in,) + data.shape[-2:])
            planes = [flat[f] for f in range(n_in)]
        outs = call(*planes)
        if n_out == 1:
            return outs[0]
        out = jnp.stack(outs)
        if out_prefix is not None:
            out = out.reshape(out_prefix + out.shape[1:])
        return out

    return op


def _pick_band_k_3d(shape, itemsize: int):
    """Choose (band, k) for the 3D kernel from empirical VMEM limits.

    The x halos cost only k planes each (x is the untiled major dim), so the
    VMEM footprint is ≈ (2·band + 4k + loop temporaries) planes against the
    16 MB scoped-vmem limit.
    """
    nx, ny, nz = shape
    plane = ny * nz * itemsize
    if plane <= 96 * 1024:
        band, k = 8, 4
    elif plane <= 256 * 1024:
        band, k = 8, 2
    else:
        return None
    if nx % band != 0:
        return None
    return band, k


def supports_affine_laplace_3d(grid, dtype, *, interpret: bool = False) -> bool:
    if not isinstance(grid, CartesianGrid) or grid.num_axes != 3:
        return False
    if interpret:
        return _pick_band_k_3d(grid.shape, np.dtype(dtype).itemsize) is not None
    if jax.default_backend() != "tpu":
        return False
    nx, ny, nz = grid.shape
    if nx % 8 != 0 or ny % 8 != 0 or nz % 128 != 0 or nx < 16:
        return False
    # f32 only: the y/z neighbors use lane/sublane rolls, which Mosaic
    # cannot compile for bf16
    if np.dtype(dtype) != np.dtype(np.float32):
        return False
    return _pick_band_k_3d(grid.shape, np.dtype(dtype).itemsize) is not None


def make_affine_laplace_3d(
    grid: CartesianGrid, *, a: float = 0.0, b: float = 1.0, k: int | None = None,
    dtype=np.float32, bcs=None, interpret: bool = False,
) -> tuple[Callable, int]:
    """3D variant: bands over the first axis, lane/sublane rolls for y/z.

    Returns (window_k applying k steps, k). At 256³ fp32 this reaches
    ≈53 G updates/s (k=2) and at 128³ ≈86 G (k=4), vs ≈13 G for the XLA path.
    Like the 2D kernel, const-affine BCs lower as in-kernel ghost fixups:
    plane rewrites at the banded axis (edge programs) and sublane/lane patches
    after the rolls. (No corner-weight gate: the
    ``laplacian_2d_corner_weight`` config only alters 2D stencils.)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bc_params = None if bcs is None else affine_bc_params(grid, bcs)
    if bcs is None and not all(grid.periodic):
        raise PallasUnsupportedError(
            "Non-periodic grids require explicit boundary conditions"
        )
    if not supports_affine_laplace_3d(grid, dtype, interpret=interpret):
        raise PallasUnsupportedError(
            "Fused 3D laplace requires an aligned 3D Cartesian "
            "grid with float32/bfloat16 data on a TPU backend"
        )
    band_k = _pick_band_k_3d(grid.shape, np.dtype(dtype).itemsize)
    band, k_max = band_k
    if k is None:
        k = k_max
    if not 1 <= k <= min(k_max, _HALO):
        raise PallasUnsupportedError(f"k={k} unsupported for this 3D shape")
    nx, ny, nz = grid.shape
    n_programs = nx // band
    sx, sy, sz = (1.0 / grid.discretization**2).tolist()
    isotropic = sx == sy == sz
    bc_x = None if bc_params is None else bc_params[0]
    bc_y = None if bc_params is None else bc_params[1]
    bc_z = None if bc_params is None else bc_params[2]

    def kernel(f_hbm, out_ref, band_ref, halo_top, halo_bot, sem):
        # x is the MAJOR dim of the (8,128)-tiled (y,z) planes, so x slices
        # have no alignment granule: the halo buffers hold exactly k planes
        i = pl.program_id(0)
        row0 = i * band
        main = pltpu.make_async_copy(
            f_hbm.at[pl.ds(pl.multiple_of(row0, 8), band)], band_ref, sem.at[0]
        )
        main.start()
        top_row = jax.lax.rem(row0 + np.int32(nx - k), np.int32(nx))
        top = pltpu.make_async_copy(
            f_hbm.at[pl.ds(top_row, k)], halo_top, sem.at[1]
        )
        top.start()
        bot_row = jax.lax.rem(row0 + np.int32(band), np.int32(nx))
        bot = pltpu.make_async_copy(
            f_hbm.at[pl.ds(bot_row, k)], halo_bot, sem.at[2]
        )
        bot.start()
        main.wait()
        top.wait()
        bot.wait()

        work = jnp.concatenate(
            [halo_top[:, :, :], band_ref[:, :, :], halo_bot[:, :, :]], axis=0
        )
        for s in range(k):
            if bc_x is not None:
                # ghost planes at the global x edges (programs 0 / last)
                (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = bc_x
                e_lo = k - s
                ghost_lo = c_lo + f1_lo * work[e_lo : e_lo + 1]
                if f2_lo:
                    ghost_lo = ghost_lo + f2_lo * work[e_lo + 1 : e_lo + 2]
                e_hi = band + k - s - 1
                ghost_hi = c_hi + f1_hi * work[e_hi : e_hi + 1]
                if f2_hi:
                    ghost_hi = ghost_hi + f2_hi * work[e_hi - 1 : e_hi]
                planes = jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
                work = jnp.where((planes == e_lo - 1) & (i == 0), ghost_lo, work)
                work = jnp.where(
                    (planes == e_hi + 1) & (i == n_programs - 1), ghost_hi, work
                )
            up = work[:-2]
            center = work[1:-1]
            down = work[2:]
            north = pltpu.roll(center, 1, 1)
            south = pltpu.roll(center, ny - 1, 1)
            west = pltpu.roll(center, 1, 2)
            east = pltpu.roll(center, nz - 1, 2)
            if bc_y is not None:
                (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = bc_y
                ghost_lo = c_lo + f1_lo * center
                if f2_lo:
                    ghost_lo = ghost_lo + f2_lo * south
                ghost_hi = c_hi + f1_hi * center
                if f2_hi:
                    ghost_hi = ghost_hi + f2_hi * north
                ys = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
                north = jnp.where(ys == 0, ghost_lo, north)
                south = jnp.where(ys == ny - 1, ghost_hi, south)
            if bc_z is not None:
                (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = bc_z
                ghost_lo = c_lo + f1_lo * center
                if f2_lo:
                    ghost_lo = ghost_lo + f2_lo * east
                ghost_hi = c_hi + f1_hi * center
                if f2_hi:
                    ghost_hi = ghost_hi + f2_hi * west
                zs = jax.lax.broadcasted_iota(jnp.int32, center.shape, 2)
                west = jnp.where(zs == 0, ghost_lo, west)
                east = jnp.where(zs == nz - 1, ghost_hi, east)
            if isotropic:
                lap6 = up + down + north + south + west + east - 6.0 * center
                work = a * center + (b * sx) * lap6
            else:
                lap = (
                    (up + down - 2.0 * center) * sx
                    + (north + south - 2.0 * center) * sy
                    + (west + east - 2.0 * center) * sz
                )
                work = a * center + b * lap
        out_ref[:, :, :] = work

    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        grid=(nx // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (band, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, ny, nz), dtype),
            pltpu.VMEM((k, ny, nz), dtype),
            pltpu.VMEM((k, ny, nz), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    def window_k(data):
        return call(jnp.asarray(data, dtype=dtype))

    return window_k, k


def make_fused_euler_window_3d(
    grid: CartesianGrid, *, diffusivity: float, dt: float, dtype=np.float32,
    bcs=None, interpret: bool = False,
) -> Callable:
    """3D analogue of :func:`make_fused_euler_window_2d`. (No corner-weight
    gate: the ``laplacian_2d_corner_weight`` config only alters 2D stencils.)

    Large (y, z) planes route through the y-chunked multi-stencil window
    (:func:`_make_ychunk_multi_window_3d`) — deeper temporal blocks than the
    plane-resident roll kernel once a plane exceeds 96 KB (measured 9.78e10
    vs 6.77e10 updates/s at 256³, scripts/experiment_3d_ychunk.py).
    """
    b = dt * diffusivity
    if (
        not interpret
        and isinstance(grid, CartesianGrid)
        and grid.num_axes == 3
        and jax.default_backend() == "tpu"
        and np.dtype(dtype) == np.dtype(np.float32)
        and grid.shape[1] * grid.shape[2] * np.dtype(dtype).itemsize
        > 96 * 1024
        and _pick_ychunk_3d(grid.shape, np.dtype(dtype).itemsize, 1, 1)
        is not None
    ):
        specs = None if bcs is None else affine_bc_specs(grid, bcs)

        def _static_side(side):
            return (
                side.const_t is None
                and side.const_xt is None
                and side.f1_t is None
            )

        # time-independent configs (scalars AND per-face arrays — round 5
        # stages arrays into the y-chunked kernel) keep the plain
        # window(data, steps) signature this wrapper exposes
        static_ok = specs is None or all(
            axis is None or (_static_side(axis[0]) and _static_side(axis[1]))
            for axis in specs
        )
        if bcs is None and not all(grid.periodic):
            raise PallasUnsupportedError(
                "Non-periodic grids require explicit boundary conditions"
            )
        if static_ok:
            bc_inputs = (
                None if specs is None
                else collect_bc_side_inputs_3d({"c": specs})
            )

            def make_step(h):
                def step(works):
                    (w,) = works
                    return [h.trim(w, 1) + b * h.lap(w, bc=specs)]

                return step

            inner = make_chunked_multi_window_3d(
                grid, make_step, 1, 1, dtype=dtype, interpret=interpret,
                bc_inputs=bc_inputs,
            )

            def window(data, steps):
                return inner([data], steps)[0]

            return window

    _, k = make_affine_laplace_3d(
        grid, a=1.0, b=b, dtype=dtype, bcs=bcs, interpret=interpret,
    )

    def build(kk):
        step, _ = make_affine_laplace_3d(
            grid, a=1.0, b=b, k=kk, dtype=dtype, bcs=bcs,
            interpret=interpret,
        )
        return step

    return _make_binary_chunked_window(build, k)


def _make_stencil_helpers(
    grid, pl, pltpu, band: int, n_programs: int, *,
    ext_cols: bool = False, n_cols: int | None = None,
):
    """In-VMEM stencil primitives; each consumes one halo row per side.

    Every primitive takes an optional ``bc=(bc_rows, bc_cols)`` of affine
    ghost parameters (see :func:`affine_bc_params`): when given, the operand's
    ghost row at the global domain edge is rewritten before the stencil
    (edge programs only, masked by program id) and the wrapped lanes are
    patched after the rolls. The edge position inside the shrinking work
    array is derived from its shape: ``(rows - band) // 2`` halo rows remain,
    so program 0's first valid row sits at that index. Applying the BC to the
    operator's operand (which may be a derived array like ``c**3``) mirrors
    the reference's per-operator ghost-cell application.

    With ``ext_cols`` the column axis is halo-extended too (decomposed
    shards): every primitive consumes one COLUMN per side as well (shifted
    slices instead of lane rolls), and column ghost fixups rewrite the ghost
    column just outside the shrinking valid region. ``helpers.flags`` may be
    set (inside the kernel) to an int32 ``(5,)`` SMEM ref ``[row_lo, row_hi,
    col_lo, col_hi, row_offset]``; when present, edge fixups additionally
    gate on the shard sitting at the corresponding GLOBAL domain edge.
    ``n_cols`` overrides the per-shard column count (defaults to the grid's).

    BC sides may be scalar triplets ``(c, f1, f2)`` or :class:`_BCSideSpec`
    objects; for specs with array-valued or time-dependent consts the
    embedding kernel must stage the values and set, before tracing ``step``:

    - ``helpers.bc_arrays[id(spec)]`` — row-side specs: a ``(1, W)`` value
      block (W = the staged full width); column-side specs: a ``(R, 128)``
      value block whose row ``helpers.stage_row_halo + g`` holds the value
      for the program's local row ``g`` (value in lane 0, the reference's
      per-boundary-point virtual-point arrays as VMEM vectors,
      `local.py:1541-2104`);
    - ``helpers.t_consts[id(spec)]`` — the additive scalar for the CURRENT
      step (re-assigned by the kernel before each of the k step calls);
    - ``helpers.stage_col_halo`` — the column halo the row-side block was
      staged with (ext mode; 0 when the work width never shrinks).
    """
    from ..grids.cylindrical import CylindricalSymGrid

    if n_cols is None:
        n_cols = grid.shape[1]
    sx, sy = (1.0 / grid.discretization**2).tolist()
    gx, gy = (0.5 / grid.discretization).tolist()
    if isinstance(grid, CylindricalSymGrid):
        # rows = r: the Laplacian gains the (1/r) d/dr term, with the per-row
        # factor computed from the global row index (cf. make_affine_laplace_2d)
        radial = (float(grid.axes_bounds[0][0]), float(grid.discretization[0]))
    else:
        radial = None

    def radial_fac(w):
        """Per-row 1/(2 r dr) factor for the CENTER rows of work array w."""
        r_lo, dr_r = radial
        hr = (w.shape[0] - band) // 2  # remaining halo rows on each side
        rows_g = (
            pl.program_id(0) * band
            - np.int32(hr - 1)
            + jax.lax.broadcasted_iota(jnp.int32, (w.shape[0] - 2, 1), 0)
        )
        r = (rows_g.astype(w.dtype) + 0.5) * dr_r + r_lo
        return (1.0 / (2.0 * dr_r)) / r

    def radial_inv_r(w):
        """Per-row 1/r for the CENTER rows of work array w (the extra
        ``v_r/r`` term of the cylindrical divergence; reference
        `/root/reference/pde/backends/numba/operators/cylindrical_sym.py:32-363`)."""
        r_lo, dr_r = radial
        hr = (w.shape[0] - band) // 2
        rows_g = (
            pl.program_id(0) * band
            - np.int32(hr - 1)
            + jax.lax.broadcasted_iota(jnp.int32, (w.shape[0] - 2, 1), 0)
        )
        return 1.0 / ((rows_g.astype(w.dtype) + 0.5) * dr_r + r_lo)

    def edge_gates():
        """(row_lo, row_hi, col_lo, col_hi) boolean gates for ghost fixups."""
        i = pl.program_id(0)
        row_lo, row_hi = i == 0, i == n_programs - 1
        col_lo = col_hi = True
        flags = helpers.flags
        if flags is not None:
            row_lo = row_lo & (flags[0] != 0)
            row_hi = row_hi & (flags[1] != 0)
            col_lo = flags[2] != 0
            col_hi = flags[3] != 0
        return row_lo, row_hi, col_lo, col_hi

    def as_spec(side):
        if isinstance(side, _BCSideSpec):
            return side
        c, f1, f2 = side
        return _BCSideSpec(f1, f2, c)

    def const_of(spec, shape, axis_side):
        """Additive ghost const for one side, matched to the work geometry.

        ``axis_side='row'``: per-column values, returned as a scalar or a
        ``(1, shape[1])`` slice of the staged block (the work width only
        shrinks in ext mode — ``stage_col_halo`` halo columns were staged).
        ``axis_side='col'``: per-row values, returned as a scalar or a
        ``(shape[0], 1)`` slice — staged-block row of local row ``g`` is
        ``stage_row_halo + g`` and the array's first row is local row
        ``-(shape[0] - band) // 2``.

        Space-and-time-dependent consts (``spec.const_xt``) read the
        CURRENT step's slice of a per-chunk table: row-side blocks are
        ``(k, W)`` (step-indexed rows), column-side blocks ``(k, R, 128)``
        (step-indexed leading dim); the kernel sets ``helpers.step_idx``
        before each step call.
        """
        if spec.const_xt is not None:
            arr = helpers.bc_arrays[id(spec)]
            s = helpers.step_idx
            if axis_side == "row":
                off = helpers.stage_col_halo - (shape[1] - n_cols) // 2
                return arr[s : s + 1, off : off + shape[1]]
            off = helpers.stage_row_halo - (shape[0] - band) // 2
            return arr[s][off : off + shape[0]][:, 0:1]
        c = spec.const_static
        if np.ndim(c) != 0:
            arr = helpers.bc_arrays[id(spec)]
            if axis_side == "row":
                off = helpers.stage_col_halo - (shape[1] - n_cols) // 2
                c = arr[0:1, off : off + shape[1]]
            else:
                off = helpers.stage_row_halo - (shape[0] - band) // 2
                c = arr[off : off + shape[0]][:, 0:1]
        if spec.const_t is not None:
            c = c + helpers.t_consts[id(spec)]
        return c

    def factor_of(spec, attr, shape, axis_side):
        """Ghost-formula coefficient for one side: the scalar, the staged
        per-point vector (``helpers.bc_factors[(id(spec), attr)]``) matched
        to the work geometry like :func:`const_of`'s array branch, or the
        CURRENT step's scalar from the SMEM t-table for time-dependent
        coefficients (``helpers.t_factors``)."""
        if attr == "f1" and spec.f1_t is not None:
            return helpers.t_factors[(id(spec), "f1")]
        f = getattr(spec, attr)
        if np.ndim(f) == 0:
            return f
        arr = helpers.bc_factors[(id(spec), attr)]
        if axis_side == "row":
            off = helpers.stage_col_halo - (shape[1] - n_cols) // 2
            return arr[0:1, off : off + shape[1]]
        off = helpers.stage_row_halo - (shape[0] - band) // 2
        return arr[off : off + shape[0]][:, 0:1]

    def _nonzero(f) -> bool:
        return bool(np.any(f)) if np.ndim(f) else bool(f)

    def fix_ghost_rows(w, bc_rows):
        if bc_rows is None:
            return w
        lo, hi = as_spec(bc_rows[0]), as_spec(bc_rows[1])
        hr = (w.shape[0] - band) // 2  # remaining halo rows on each side
        gate_lo, gate_hi, _, _ = edge_gates()
        e_lo = hr  # first globally valid row on program 0
        ghost_lo = const_of(lo, w.shape, "row") + factor_of(
            lo, "f1", w.shape, "row"
        ) * w[e_lo : e_lo + 1, :]
        if _nonzero(lo.f2):
            ghost_lo = ghost_lo + factor_of(
                lo, "f2", w.shape, "row"
            ) * w[e_lo + 1 : e_lo + 2, :]
        e_hi = w.shape[0] - 1 - hr  # last globally valid row on the last program
        ghost_hi = const_of(hi, w.shape, "row") + factor_of(
            hi, "f1", w.shape, "row"
        ) * w[e_hi : e_hi + 1, :]
        if _nonzero(hi.f2):
            ghost_hi = ghost_hi + factor_of(
                hi, "f2", w.shape, "row"
            ) * w[e_hi - 1 : e_hi, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        w = jnp.where((rows == e_lo - 1) & gate_lo, ghost_lo, w)
        w = jnp.where((rows == e_hi + 1) & gate_hi, ghost_hi, w)
        return w

    def fix_ghost_cols(w, bc_cols):
        """Rewrite the ghost COLUMN outside the valid region (ext mode)."""
        if bc_cols is None:
            return w
        lo, hi = as_spec(bc_cols[0]), as_spec(bc_cols[1])
        hc = (w.shape[1] - n_cols) // 2  # remaining halo cols on each side
        _, _, gate_lo, gate_hi = edge_gates()
        e_lo = hc
        ghost_lo = const_of(lo, w.shape, "col") + factor_of(
            lo, "f1", w.shape, "col"
        ) * w[:, e_lo : e_lo + 1]
        if _nonzero(lo.f2):
            ghost_lo = ghost_lo + factor_of(
                lo, "f2", w.shape, "col"
            ) * w[:, e_lo + 1 : e_lo + 2]
        e_hi = w.shape[1] - 1 - hc
        ghost_hi = const_of(hi, w.shape, "col") + factor_of(
            hi, "f1", w.shape, "col"
        ) * w[:, e_hi : e_hi + 1]
        if _nonzero(hi.f2):
            ghost_hi = ghost_hi + factor_of(
                hi, "f2", w.shape, "col"
            ) * w[:, e_hi - 1 : e_hi]
        cols = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where((cols == e_lo - 1) & gate_lo, ghost_lo, w)
        w = jnp.where((cols == e_hi + 1) & gate_hi, ghost_hi, w)
        return w

    def neighbors_cols(center, bc_cols):
        """(left, right) lane neighbors honoring column BCs at lanes 0/m-1."""
        left = pltpu.roll(center, 1, 1)
        right = pltpu.roll(center, n_cols - 1, 1)
        if bc_cols is not None:
            lo, hi = as_spec(bc_cols[0]), as_spec(bc_cols[1])
            _, _, gate_lo, gate_hi = edge_gates()
            ghost_lo = const_of(lo, center.shape, "col") + factor_of(
                lo, "f1", center.shape, "col"
            ) * center
            if _nonzero(lo.f2):
                ghost_lo = ghost_lo + factor_of(
                    lo, "f2", center.shape, "col"
                ) * right
            ghost_hi = const_of(hi, center.shape, "col") + factor_of(
                hi, "f1", center.shape, "col"
            ) * center
            if _nonzero(hi.f2):
                ghost_hi = ghost_hi + factor_of(
                    hi, "f2", center.shape, "col"
                ) * left
            lanes = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
            left = jnp.where((lanes == 0) & gate_lo, ghost_lo, left)
            right = jnp.where((lanes == n_cols - 1) & gate_hi, ghost_hi, right)
        return left, right

    if ext_cols:
        # decomposed columns: shifted slices instead of lane rolls; every
        # primitive consumes one column per side, mirroring the rows
        class helpers:
            cols = n_cols
            flags = None
            bc_arrays: dict = {}
            bc_factors: dict = {}
            t_consts: dict = {}
            t_factors: dict = {}
            stage_row_halo = 0
            stage_col_halo = 0
            step_idx = 0

            @staticmethod
            def trim(value, amount):
                if isinstance(value, tuple):
                    return tuple(helpers.trim(v, amount) for v in value)
                if amount == 0 or jnp.ndim(value) == 0:
                    return value
                return value[amount:-amount, amount:-amount]

            @staticmethod
            def lap(work, bc=None):
                bc_rows, bc_cols = bc if bc is not None else (None, None)
                work = fix_ghost_rows(work, bc_rows)
                work = fix_ghost_cols(work, bc_cols)
                up = work[:-2, 1:-1]
                center = work[1:-1, 1:-1]
                down = work[2:, 1:-1]
                left = work[1:-1, :-2]
                right = work[1:-1, 2:]
                if radial is not None:
                    fac = radial_fac(work)
                    return (
                        ((sx) - fac) * up
                        + ((sx) + fac) * down
                        + sy * (left + right)
                        - (2.0 * (sx + sy)) * center
                    )
                if sx == sy:
                    return (up + down + left + right - 4.0 * center) * sx
                return (up + down - 2.0 * center) * sx + (
                    left + right - 2.0 * center
                ) * sy

            @staticmethod
            def gradient_squared(work, bc=None):
                bc_rows, bc_cols = bc if bc is not None else (None, None)
                work = fix_ghost_rows(work, bc_rows)
                work = fix_ghost_cols(work, bc_cols)
                d_row = (work[2:, 1:-1] - work[:-2, 1:-1]) * gx
                d_col = (work[1:-1, 2:] - work[1:-1, :-2]) * gy
                return d_row * d_row + d_col * d_col

            @staticmethod
            def d_row(work, bc=None):
                bc_rows = bc[0] if bc is not None else None
                work = fix_ghost_rows(work, bc_rows)
                return (work[2:, 1:-1] - work[:-2, 1:-1]) * gx

            @staticmethod
            def d_col(work, bc=None):
                bc_cols = bc[1] if bc is not None else None
                work = fix_ghost_cols(work, bc_cols)
                return (work[1:-1, 2:] - work[1:-1, :-2]) * gy


            @staticmethod
            def divergence(comps, bc=None):
                """Vector divergence; cylindrical grids add ``v_r/r``."""
                vr, vz = comps
                out = helpers.d_row(vr, bc=bc) + helpers.d_col(vz, bc=bc)
                if radial is not None:
                    out = out + vr[1:-1, 1:-1] * radial_inv_r(vr)
                return out

        helpers.derivatives = (helpers.d_row, helpers.d_col)
        return helpers

    class helpers:
        cols = n_cols
        flags = None
        bc_arrays: dict = {}
        bc_factors: dict = {}
        t_consts: dict = {}
        t_factors: dict = {}
        stage_row_halo = 0
        stage_col_halo = 0
        step_idx = 0

        @staticmethod
        def trim(value, amount):
            if isinstance(value, tuple):
                return tuple(helpers.trim(v, amount) for v in value)
            if amount == 0 or jnp.ndim(value) == 0:
                return value
            return value[amount:-amount, :]

        @staticmethod
        def lap(work, bc=None):
            bc_rows, bc_cols = bc if bc is not None else (None, None)
            work = fix_ghost_rows(work, bc_rows)
            up = work[:-2, :]
            center = work[1:-1, :]
            down = work[2:, :]
            left, right = neighbors_cols(center, bc_cols)
            if radial is not None:
                fac = radial_fac(work)
                return (
                    ((sx) - fac) * up
                    + ((sx) + fac) * down
                    + sy * (left + right)
                    - (2.0 * (sx + sy)) * center
                )
            if sx == sy:
                return (up + down + left + right - 4.0 * center) * sx
            return (up + down - 2.0 * center) * sx + (
                left + right - 2.0 * center
            ) * sy

        @staticmethod
        def gradient_squared(work, bc=None):
            bc_rows, bc_cols = bc if bc is not None else (None, None)
            work = fix_ghost_rows(work, bc_rows)
            center = work[1:-1, :]
            d_row = (work[2:, :] - work[:-2, :]) * gx
            left, right = neighbors_cols(center, bc_cols)
            d_col = (right - left) * gy
            return d_row * d_row + d_col * d_col

        @staticmethod
        def d_row(work, bc=None):
            """Central derivative along axis 0 (shrinks one row per side)."""
            bc_rows = bc[0] if bc is not None else None
            work = fix_ghost_rows(work, bc_rows)
            return (work[2:, :] - work[:-2, :]) * gx

        @staticmethod
        def d_col(work, bc=None):
            """Central derivative along axis 1 (columns periodic via rolls)."""
            bc_cols = bc[1] if bc is not None else None
            center = work[1:-1, :]
            left, right = neighbors_cols(center, bc_cols)
            return (right - left) * gy


        @staticmethod
        def divergence(comps, bc=None):
            """Vector divergence; cylindrical grids add ``v_r/r``."""
            vr, vz = comps
            out = helpers.d_row(vr, bc=bc) + helpers.d_col(vz, bc=bc)
            if radial is not None:
                out = out + vr[1:-1, :] * radial_inv_r(vr)
            return out

    helpers.derivatives = (helpers.d_row, helpers.d_col)
    return helpers


def _make_stencil_helpers_3d(
    grid, pl, pltpu, band: int, n_programs: int, *,
    ext_y: bool = False, ext_z: bool = False,
    ny: int | None = None, nz: int | None = None,
):
    """3D in-VMEM stencil primitives; each consumes one x-plane per side.

    The 3D analogue of :func:`_make_stencil_helpers`: the work arrays shrink
    along x (the banded axis) always; y/z stay locally periodic via
    sublane/lane rolls with BC patches unless ``ext_y``/``ext_z`` marks the
    axis halo-extended (decomposed shards) — then the primitives use shifted
    slices and also consume one row/lane per side there. ``bc`` is the
    per-axis affine ghost tuple of :func:`affine_bc_params` (3 entries).
    ``ny``/``nz`` are the VALID local extents (default: the grid's).
    ``helpers.flags`` may be set inside a kernel to an int32 ``(6,)`` SMEM
    ref ``[x_lo, x_hi, y_lo, y_hi, z_lo, z_hi]``; when present, ghost fixups
    additionally gate on the shard sitting at the GLOBAL domain edge.
    """
    if ny is None:
        ny = grid.shape[1]
    if nz is None:
        nz = grid.shape[2]
    sx, sy, sz = (1.0 / grid.discretization**2).tolist()
    gx, gy, gz = (0.5 / grid.discretization).tolist()

    def gate(slot, base=None):
        flags = helpers.flags
        g = True if base is None else base
        if flags is not None:
            g = g & (flags[slot] != 0)
        return g

    def as_spec(side):
        if isinstance(side, _BCSideSpec):
            return side
        c, f1, f2 = side
        return _BCSideSpec(f1, f2, c)

    def const_of(spec, shape, ax):
        """Additive ghost const for one side, matched to geometry ``shape``.

        Array consts read the staged blocks (see
        :func:`collect_bc_side_inputs_3d` for the layouts): the x offset
        tracks the shrinking work extent relative to the staged x halo
        (``helpers.stage_x_halo``); y/z offsets matter only in ext mode
        (``stage_y_halo``/``stage_z_halo`` staged halo layers).
        Space-and-time values read the CURRENT step's slab of a per-chunk
        step-indexed table (one extra leading ``k`` dim; the kernel sets
        ``helpers.step_idx`` before each step call).
        """

        def offsets(shape):
            offx = helpers.stage_x_halo - (shape[0] - band) // 2
            offy = (
                helpers.stage_y_halo - (shape[1] - ny) // 2 if ext_y else 0
            )
            offz = (
                helpers.stage_z_halo - (shape[2] - nz) // 2 if ext_z else 0
            )
            return offx, offy, offz

        if spec.const_xt is not None:
            arr = helpers.bc_arrays[id(spec)]
            s = helpers.step_idx
            offx, offy, offz = offsets(shape)
            if ax == 0:  # (k, ny_s, nz_s): the step slab IS the plane dim
                return arr[
                    s : s + 1, offy : offy + shape[1], offz : offz + shape[2]
                ]
            if ax == 1:  # (k, X_s, 1, nz_s)
                return arr[s][
                    offx : offx + shape[0], 0:1, offz : offz + shape[2]
                ]
            return arr[s][
                offx : offx + shape[0], offy : offy + shape[1], 0:1
            ]
        c = spec.const_static
        if np.ndim(c) != 0:
            arr = helpers.bc_arrays[id(spec)]
            offx, offy, offz = offsets(shape)
            if ax == 0:  # (1, ny_s, nz_s) plane
                c = arr[0:1, offy : offy + shape[1], offz : offz + shape[2]]
            elif ax == 1:  # (X_s, 1, nz_s) block
                c = arr[offx : offx + shape[0], 0:1, offz : offz + shape[2]]
            else:  # (X_s, ny_s, 128) lane-broadcast block, value in lane 0
                c = arr[offx : offx + shape[0], offy : offy + shape[1], 0:1]
        if spec.const_t is not None:
            c = c + helpers.t_consts[id(spec)]
        return c

    def factor_of(spec, attr, shape, ax):
        """Ghost-formula coefficient: the scalar, the staged per-face
        vector (``helpers.bc_factors[(id(spec), attr)]``) matched to the
        geometry like :func:`const_of`'s array branch, or the CURRENT
        step's scalar from the SMEM t-table (``helpers.t_factors``)."""
        if attr == "f1" and spec.f1_t is not None:
            return helpers.t_factors[(id(spec), "f1")]
        f = getattr(spec, attr)
        if np.ndim(f) == 0:
            return f
        arr = helpers.bc_factors[(id(spec), attr)]
        offx = helpers.stage_x_halo - (shape[0] - band) // 2
        offy = helpers.stage_y_halo - (shape[1] - ny) // 2 if ext_y else 0
        offz = helpers.stage_z_halo - (shape[2] - nz) // 2 if ext_z else 0
        if ax == 0:
            return arr[0:1, offy : offy + shape[1], offz : offz + shape[2]]
        if ax == 1:
            return arr[offx : offx + shape[0], 0:1, offz : offz + shape[2]]
        return arr[offx : offx + shape[0], offy : offy + shape[1], 0:1]

    def _nonzero(f) -> bool:
        return bool(np.any(f)) if np.ndim(f) else bool(f)

    def fix_ghost_x(w, bc_x):
        if bc_x is None:
            return w
        lo, hi = as_spec(bc_x[0]), as_spec(bc_x[1])
        hr = (w.shape[0] - band) // 2  # remaining halo planes per side
        i = pl.program_id(0)
        e_lo = hr
        ghost_lo = const_of(lo, w.shape, 0) + factor_of(
            lo, "f1", w.shape, 0
        ) * w[e_lo : e_lo + 1]
        if _nonzero(lo.f2):
            ghost_lo = ghost_lo + factor_of(
                lo, "f2", w.shape, 0
            ) * w[e_lo + 1 : e_lo + 2]
        e_hi = w.shape[0] - 1 - hr
        ghost_hi = const_of(hi, w.shape, 0) + factor_of(
            hi, "f1", w.shape, 0
        ) * w[e_hi : e_hi + 1]
        if _nonzero(hi.f2):
            ghost_hi = ghost_hi + factor_of(
                hi, "f2", w.shape, 0
            ) * w[e_hi - 1 : e_hi]
        planes = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        w = jnp.where((planes == e_lo - 1) & gate(0, i == 0), ghost_lo, w)
        w = jnp.where(
            (planes == e_hi + 1) & gate(1, i == n_programs - 1), ghost_hi, w
        )
        return w

    def fix_ghost_dim(w, bc_side, dim, n_valid):
        """Rewrite the ghost layer outside the valid region (ext mode)."""
        if bc_side is None:
            return w
        lo, hi = as_spec(bc_side[0]), as_spec(bc_side[1])

        def sl(idx):
            return tuple(
                slice(idx, idx + 1) if d == dim else slice(None)
                for d in range(3)
            )

        hc = (w.shape[dim] - n_valid) // 2  # remaining halo layers per side
        e_lo = hc
        ghost_lo = const_of(lo, w.shape, dim) + factor_of(
            lo, "f1", w.shape, dim
        ) * w[sl(e_lo)]
        if _nonzero(lo.f2):
            ghost_lo = ghost_lo + factor_of(
                lo, "f2", w.shape, dim
            ) * w[sl(e_lo + 1)]
        e_hi = w.shape[dim] - 1 - hc
        ghost_hi = const_of(hi, w.shape, dim) + factor_of(
            hi, "f1", w.shape, dim
        ) * w[sl(e_hi)]
        if _nonzero(hi.f2):
            ghost_hi = ghost_hi + factor_of(
                hi, "f2", w.shape, dim
            ) * w[sl(e_hi - 1)]
        idxs = jax.lax.broadcasted_iota(jnp.int32, w.shape, dim)
        w = jnp.where((idxs == e_lo - 1) & gate(2 * dim), ghost_lo, w)
        w = jnp.where((idxs == e_hi + 1) & gate(2 * dim + 1), ghost_hi, w)
        return w

    def neighbors_axis(center, bc_side, axis, n):
        """(low, high) neighbors along y (axis 1) or z (axis 2) via rolls."""
        low = pltpu.roll(center, 1, axis)
        high = pltpu.roll(center, n - 1, axis)
        if bc_side is not None:
            lo, hi = as_spec(bc_side[0]), as_spec(bc_side[1])
            ghost_lo = const_of(lo, center.shape, axis) + factor_of(
                lo, "f1", center.shape, axis
            ) * center
            if _nonzero(lo.f2):
                ghost_lo = ghost_lo + factor_of(
                    lo, "f2", center.shape, axis
                ) * high
            ghost_hi = const_of(hi, center.shape, axis) + factor_of(
                hi, "f1", center.shape, axis
            ) * center
            if _nonzero(hi.f2):
                ghost_hi = ghost_hi + factor_of(
                    hi, "f2", center.shape, axis
                ) * low
            idx = jax.lax.broadcasted_iota(jnp.int32, center.shape, axis)
            low = jnp.where((idx == 0) & gate(2 * axis), ghost_lo, low)
            high = jnp.where(
                (idx == n - 1) & gate(2 * axis + 1), ghost_hi, high
            )
        return low, high

    sy_sl = slice(1, -1) if ext_y else slice(None)
    sz_sl = slice(1, -1) if ext_z else slice(None)

    def fix_all(work, bc):
        bc_x, bc_y, bc_z = bc if bc is not None else (None, None, None)
        work = fix_ghost_x(work, bc_x)
        if ext_y:
            work = fix_ghost_dim(work, bc_y, 1, ny)
        if ext_z:
            work = fix_ghost_dim(work, bc_z, 2, nz)
        return work, bc_y, bc_z

    def neighbors_y(work, center, bc_y):
        if ext_y:
            return work[1:-1, :-2, sz_sl], work[1:-1, 2:, sz_sl]
        return neighbors_axis(center, bc_y, 1, ny)

    def neighbors_z(work, center, bc_z):
        if ext_z:
            return work[1:-1, sy_sl, :-2], work[1:-1, sy_sl, 2:]
        return neighbors_axis(center, bc_z, 2, nz)

    class helpers:
        cols = nz
        flags = None
        bc_arrays: dict = {}
        bc_factors: dict = {}
        t_consts: dict = {}
        t_factors: dict = {}
        stage_x_halo = 0
        stage_y_halo = 0
        stage_z_halo = 0
        step_idx = 0

        @staticmethod
        def trim(value, amount):
            if isinstance(value, tuple):
                return tuple(helpers.trim(v, amount) for v in value)
            if amount == 0 or jnp.ndim(value) == 0:
                return value
            return value[
                amount:-amount,
                slice(amount, -amount) if ext_y else slice(None),
                slice(amount, -amount) if ext_z else slice(None),
            ]

        @staticmethod
        def lap(work, bc=None):
            work, bc_y, bc_z = fix_all(work, bc)
            up = work[:-2, sy_sl, sz_sl]
            center = work[1:-1, sy_sl, sz_sl]
            down = work[2:, sy_sl, sz_sl]
            north, south = neighbors_y(work, center, bc_y)
            west, east = neighbors_z(work, center, bc_z)
            if sx == sy == sz:
                return (
                    up + down + north + south + west + east - 6.0 * center
                ) * sx
            return (
                (up + down - 2.0 * center) * sx
                + (north + south - 2.0 * center) * sy
                + (west + east - 2.0 * center) * sz
            )

        @staticmethod
        def gradient_squared(work, bc=None):
            work, bc_y, bc_z = fix_all(work, bc)
            center = work[1:-1, sy_sl, sz_sl]
            d_x = (work[2:, sy_sl, sz_sl] - work[:-2, sy_sl, sz_sl]) * gx
            north, south = neighbors_y(work, center, bc_y)
            d_y = (south - north) * gy
            west, east = neighbors_z(work, center, bc_z)
            d_z = (east - west) * gz
            return d_x * d_x + d_y * d_y + d_z * d_z

        @staticmethod
        def d_row(work, bc=None):
            bc_x = bc[0] if bc is not None else None
            work = fix_ghost_x(work, bc_x)
            return (work[2:, sy_sl, sz_sl] - work[:-2, sy_sl, sz_sl]) * gx

        @staticmethod
        def d_col(work, bc=None):
            bc_y = bc[1] if bc is not None else None
            if ext_y:
                work = fix_ghost_dim(work, bc_y, 1, ny)
                return (work[1:-1, 2:, sz_sl] - work[1:-1, :-2, sz_sl]) * gy
            center = work[1:-1, :, sz_sl]
            north, south = neighbors_axis(center, bc_y, 1, ny)
            return (south - north) * gy

        @staticmethod
        def d_depth(work, bc=None):
            bc_z = bc[2] if bc is not None else None
            if ext_z:
                work = fix_ghost_dim(work, bc_z, 2, nz)
                return (work[1:-1, sy_sl, 2:] - work[1:-1, sy_sl, :-2]) * gz
            center = work[1:-1, sy_sl, :]
            west, east = neighbors_axis(center, bc_z, 2, nz)
            return (east - west) * gz

    helpers.derivatives = (helpers.d_row, helpers.d_col, helpers.d_depth)
    return helpers


_SIDE_INPUT_BUDGET = 2 * 1024 * 1024  # staged BC side inputs (outside the
# band VMEM models); same bound as the 2D kernels' side-input gates


def _side_input_extra_2d(bc_inputs, width, band, halo, k, itemsize):
    """Per-program VMEM bytes of staged 2D BC side inputs at temporal block
    ``k``: row-side blocks are ``width`` lanes wide (n_cols for the stencil
    window, the ext lane count for the halo-extended one); column-side
    blocks broadcast across one 128-lane tile; xt tables carry a leading k
    dim."""
    if not bc_inputs:
        return 0
    n_row = sum(1 for kind, _ in bc_inputs["arrays"] if kind == "row")
    n_col = sum(1 for kind, _ in bc_inputs["arrays"] if kind == "col")
    n_row += sum(
        1 for kind, _, _ in bc_inputs.get("factors", []) if kind == "row"
    )
    n_col += sum(
        1 for kind, _, _ in bc_inputs.get("factors", []) if kind == "col"
    )
    n_xtr = sum(1 for kind, _ in bc_inputs.get("xt", []) if kind == "row")
    n_xtc = sum(1 for kind, _ in bc_inputs.get("xt", []) if kind == "col")
    return (
        (n_row + n_xtr * k) * width
        + (n_col + n_xtc * k) * (band + 2 * halo) * 128
    ) * itemsize


def _side_input_extra_3d(shape, bc_inputs, band, k, halo_per_step, itemsize):
    """Per-program VMEM bytes of staged 3D BC side inputs at temporal block
    ``k``: static per-face arrays plus the step-indexed xt tables (leading k
    dim), with the x padding growing as ``k * halo_per_step``."""
    if not bc_inputs:
        return 0
    nx, ny, nz = shape
    n_ax = [0, 0, 0]
    for ax, _spec, _attr in bc_inputs["arrays"]:
        n_ax[ax] += 1
    n_xt = [0, 0, 0]
    for ax, _spec in bc_inputs.get("xt", []):
        n_xt[ax] += 1
    halo = k * halo_per_step
    return (
        (n_ax[0] + n_xt[0] * k) * ny * nz
        + (n_ax[1] + n_xt[1] * k) * (band + 2 * halo) * nz
        + (n_ax[2] + n_xt[2] * k) * (band + 2 * halo) * ny * 128
    ) * itemsize


_YCHUNK_VMEM_BUDGET = 80 * 1024 * 1024  # y-chunk picker budget (the default
# 16 MB scoped limit is what capped the roll-path kernels at k=2 on 256 KB
# planes; v5e has 128 MB physical VMEM, and the call passes the TIGHTEST
# viable limit for the chosen config via ``vmem_footprint`` — see
# ``_MOSAIC_VMEM_DEFAULT`` for why tight beats a blanket raise)


def _ychunk_footprint(
    nz: int, band: int, ny_c: int, kk: int, halo_per_step: int,
    n_fields: int, itemsize: int,
) -> int:
    """Per-program VMEM footprint of the y-chunked 3D kernel."""
    halo = kk * halo_per_step
    yh = -(-halo // _HALO) * _HALO
    ext = (band + 2 * halo) * (ny_c + 2 * yh) * nz
    outs = 2 * band * ny_c * nz  # double-buffered output block
    return (n_fields * (ext + outs) + 4 * ext) * itemsize


def _pick_ychunk_3d(shape, itemsize: int, halo_per_step: int, n_fields: int):
    """Choose (band, ny_c, k) for the y-chunked 3D kernel, or None.

    The roll-path kernel (:func:`_pick_band_k_3d`) keeps whole (y, z) planes
    in VMEM, which caps the temporal block at k=2 once a plane exceeds 96 KB
    and rules the kernel out entirely past 256 KB. Chunking y (a second
    pallas-grid dim, halo-extended y via shifted slices) shrinks the working
    set so large volumes run deep temporal blocks: measured 9.78e10 vs
    6.77e10 cell-updates/s at 256³ f32 (band=64, ny_c=128, k=8 — see
    scripts/experiment_3d_ychunk.py and docs/BENCHMARKS.md).
    """
    nx, ny, nz = shape
    if nx % 8 or ny % 8 or nz % 128:
        return None

    def footprint(band, ny_c, kk):
        return _ychunk_footprint(
            nz, band, ny_c, kk, halo_per_step, n_fields, itemsize
        )

    for band in (64, 32, 16, 8):
        if nx % band:
            continue
        for ny_c in (128, 64, 32, 16, 8):
            if ny % ny_c or ny_c >= ny:
                continue
            for kk in (8, 4, 2, 1):
                halo = kk * halo_per_step
                yh = -(-halo // _HALO) * _HALO
                if halo > band or yh > ny_c:
                    continue
                if footprint(band, ny_c, kk) <= _YCHUNK_VMEM_BUDGET:
                    return band, ny_c, kk
    return None


def _ychunk_interpret_cfg(shape, halo_per_step: int, k: int | None):
    """(band, ny_c, k) for interpret-mode tests of the y-chunked kernel."""
    nx, ny, nz = shape
    band = nx if nx <= 8 or nx % 8 else 8
    while band > 1 and nx % band:
        band //= 2
    ny_c = max(
        (d for d in range(8, ny, 8) if ny % d == 0), default=None
    )
    if ny_c is None:
        raise PallasUnsupportedError(
            "No y-chunk size divides this grid (need a proper multiple-of-8 "
            "divisor of the y extent)"
        )
    if k is None:
        k = max(1, 4 // halo_per_step)
    halo = k * halo_per_step
    yh = -(-halo // _HALO) * _HALO
    if band < 1 or halo > band or yh > ny_c:
        raise PallasUnsupportedError("Grid too small for the y-chunked window")
    return band, ny_c, k


def _make_ychunk_multi_window_3d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    band: int, ny_c: int, k: int, dtype, interpret: bool, bc_inputs=None,
    ext_x: bool = False, local_nx: int | None = None,
) -> tuple[Callable, int]:
    """Y-chunked 3D temporal-blocking kernel over ``n_fields`` volumes.

    A 2D pallas grid (x bands × y chunks); both x AND y are halo-extended
    (nine wrapped halo DMAs per field fill a ``(band+2·halo, ny_c+2·yh, nz)``
    VMEM block), y neighbors come from shifted slices instead of sublane
    rolls, and z stays locally periodic via lane rolls. Ghost fixups reuse
    the sharded-kernel machinery (:func:`_make_stencil_helpers_3d` with
    ``ext_y``): ``helpers.flags`` gates the y fixups on the chunks holding
    the global y edges. Scalar-affine, t-dependent, per-face ARRAY, AND
    space-time BC consts/factors lower (arrays stage as wrap-padded HBM
    blocks DMA-sliced per program — x-side planes y-sliced per chunk,
    y-side blocks x-sliced per band, z-side lane-broadcast blocks sliced in
    both; step-indexed xt tables use the same layouts with one extra
    leading ``k`` dim); only multi-stage per-(step, stage) tables stay on
    the roll path. The
    wrapped halo data is correct for periodic axes and overwritten by the
    per-step ghost rewrites otherwise — garbage beyond the ghost layer
    stays outside the shrinking light cone, exactly as in the x-banded
    kernels.

    With ``ext_x`` (decomposed x-cut shards) the inputs are halo-extended
    local blocks of ``local_nx`` rows (x halos filled by ppermute outside;
    y stays globally periodic-wrapped per chunk since only x is cut), the
    window takes a runtime int32 ``(6,)`` global-edge flag operand, and
    only scalar-affine specs lower (BC side inputs stay on the roll path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = grid.shape
    if local_nx is not None:
        nx = local_nx
    halo = k * halo_per_step
    yh = -(-halo // _HALO) * _HALO  # y halo rounded to the sublane granule
    n_xp = nx // band
    n_yp = ny // ny_c
    helpers = _make_stencil_helpers_3d(
        grid, pl, pltpu, band, n_xp, ext_y=True, ny=ny_c
    )
    step = make_step(helpers)
    F = n_fields
    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    arr_entries = [] if bc_inputs is None else bc_inputs["arrays"]
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    xt_pl = [spec for ax, spec in xt_entries if ax == 0]
    xt_y = [spec for ax, spec in xt_entries if ax == 1]
    xt_z = [spec for ax, spec in xt_entries if ax == 2]
    n_xpl, n_xy, n_xz = len(xt_pl), len(xt_y), len(xt_z)
    has_t = bool(t_specs)
    needs_runtime = bool(has_t or xt_entries)
    if ext_x and (arr_entries or needs_runtime):
        raise PallasUnsupportedError(
            "The halo-extended y-chunked kernel takes no BC side inputs "
            "(array/t-dependent values stay on the roll path)"
        )

    # per-face value arrays / Robin factors: wrap-padded global blocks,
    # DMA-sliced to each program's (x band, y chunk) work region
    plane_entries = []  # x sides: ((spec, attr), (1, ny + 2*yh, nz))
    y_entries = []  # y sides: ((spec, attr), (nx + 2*halo, 1, nz))
    z_entries = []  # z sides: ((spec, attr), (nx+2*halo, ny+2*yh, 128))
    for ax, spec, attr in arr_entries:
        arr = np.asarray(getattr(spec, attr), dtype=dtype)
        if ax == 0:
            a2 = arr.reshape(ny, nz)
            ext = np.concatenate([a2[-yh:], a2, a2[:yh]], axis=0)
            plane_entries.append(
                ((spec, attr), ext.reshape(1, ny + 2 * yh, nz))
            )
        elif ax == 1:
            a2 = arr.reshape(nx, nz)
            ext = np.concatenate([a2[-halo:], a2, a2[:halo]], axis=0)
            y_entries.append(
                ((spec, attr), ext.reshape(nx + 2 * halo, 1, nz))
            )
        else:
            a2 = arr.reshape(nx, ny)
            ext = np.concatenate([a2[-halo:], a2, a2[:halo]], axis=0)
            ext = np.concatenate(
                [ext[:, -yh:], ext, ext[:, :yh]], axis=1
            )
            z_entries.append((
                (spec, attr),
                np.broadcast_to(
                    ext[:, :, None],
                    (nx + 2 * halo, ny + 2 * yh, 128),
                ).copy(),
            ))
    n_pl, n_y, n_z = len(plane_entries), len(y_entries), len(z_entries)
    side_extra = 0
    if not interpret and (n_pl or n_y or n_z or xt_entries):
        itemsize = np.dtype(dtype).itemsize
        side_extra = (
            (n_pl + n_xpl * k) * (ny_c + 2 * yh) * nz
            + (n_y + n_xy * k) * (band + 2 * halo) * nz
            + (n_z + n_xz * k) * (band + 2 * halo) * (ny_c + 2 * yh) * 128
        ) * itemsize
        if side_extra > _SIDE_INPUT_BUDGET:
            raise PallasUnsupportedError(
                "3D BC value arrays exceed the side-input VMEM budget"
            )

    def kernel(*refs):
        pos = 0
        if ext_x:
            flags_ref = refs[pos]
            pos += 1
        if has_t:
            t_tab = refs[pos]
            pos += 1
        side_hbm = refs[pos : pos + n_pl + n_y + n_z]
        pos += n_pl + n_y + n_z
        xt_hbm = refs[pos : pos + n_xpl + n_xy + n_xz]
        pos += n_xpl + n_xy + n_xz
        ins = refs[pos : pos + F]
        outs = refs[pos + F : pos + 2 * F]
        pos += 2 * F
        blks = refs[pos : pos + F]
        pos += F
        side_vmem = refs[pos : pos + n_pl + n_y + n_z]
        pos += n_pl + n_y + n_z
        xt_vmem = refs[pos : pos + n_xpl + n_xy + n_xz]
        sem = refs[pos + n_xpl + n_xy + n_xz]
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = i * band
        y0 = j * ny_c
        if ext_x:
            # x halos are pre-filled in the extended input: one straight
            # slice covers [x0 - halo, x0 + band + halo) (offset +halo)
            xs = [(pl.multiple_of(x0, 8), band + 2 * halo, 0)]
        else:
            # three wrapped x-regions (the serial kernel wraps via rem)
            xs = [
                (jax.lax.rem(x0 + np.int32(nx - halo), np.int32(nx)), halo,
                 0),
                (pl.multiple_of(x0, 8), band, halo),
                (jax.lax.rem(x0 + np.int32(band), np.int32(nx)), halo,
                 halo + band),
            ]
        ys = [
            (pl.multiple_of(
                jax.lax.rem(y0 + np.int32(ny - yh), np.int32(ny)), 8
            ), yh, 0),
            (pl.multiple_of(y0, 8), ny_c, yh),
            (pl.multiple_of(
                jax.lax.rem(y0 + np.int32(ny_c), np.int32(ny)), 8
            ), yh, yh + ny_c),
        ]
        copies = []
        for f in range(F):
            for xg, xl, xd in xs:
                for yg, yl, yd in ys:
                    cp = pltpu.make_async_copy(
                        ins[f].at[pl.ds(xg, xl), pl.ds(yg, yl), :],
                        blks[f].at[pl.ds(xd, xl), pl.ds(yd, yl), :],
                        sem.at[len(copies)],
                    )
                    cp.start()
                    copies.append(cp)
        # side-input DMAs: padded blocks sliced to this program's region
        # (x-side planes per y chunk, y-side blocks per x band, z-side
        # lane-broadcast blocks in both)
        n_fdma = 3 * len(xs) * F
        for s_idx in range(n_pl + n_y + n_z):
            src, dst = side_hbm[s_idx], side_vmem[s_idx]
            if s_idx < n_pl:
                cp = pltpu.make_async_copy(
                    src.at[:, pl.ds(pl.multiple_of(y0, 8), ny_c + 2 * yh), :],
                    dst, sem.at[n_fdma + s_idx],
                )
            elif s_idx < n_pl + n_y:
                cp = pltpu.make_async_copy(
                    src.at[pl.ds(pl.multiple_of(x0, 8), band + 2 * halo)],
                    dst, sem.at[n_fdma + s_idx],
                )
            else:
                cp = pltpu.make_async_copy(
                    src.at[
                        pl.ds(pl.multiple_of(x0, 8), band + 2 * halo),
                        pl.ds(pl.multiple_of(y0, 8), ny_c + 2 * yh),
                        :,
                    ],
                    dst, sem.at[n_fdma + s_idx],
                )
            cp.start()
            copies.append(cp)
        # space-time value tables: same padded-block slicing with one extra
        # leading step dim (k rows; the kernel indexes helpers.step_idx)
        n_sdma = n_fdma + n_pl + n_y + n_z
        for s_idx in range(n_xpl + n_xy + n_xz):
            src, dst = xt_hbm[s_idx], xt_vmem[s_idx]
            if s_idx < n_xpl:
                cp = pltpu.make_async_copy(
                    src.at[:, pl.ds(pl.multiple_of(y0, 8), ny_c + 2 * yh), :],
                    dst, sem.at[n_sdma + s_idx],
                )
            elif s_idx < n_xpl + n_xy:
                cp = pltpu.make_async_copy(
                    src.at[:, pl.ds(pl.multiple_of(x0, 8), band + 2 * halo)],
                    dst, sem.at[n_sdma + s_idx],
                )
            else:
                cp = pltpu.make_async_copy(
                    src.at[
                        :,
                        pl.ds(pl.multiple_of(x0, 8), band + 2 * halo),
                        pl.ds(pl.multiple_of(y0, 8), ny_c + 2 * yh),
                        :,
                    ],
                    dst, sem.at[n_sdma + s_idx],
                )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        helpers.stage_x_halo = halo
        helpers.stage_y_halo = yh
        bc_arrays = {}
        bc_factors = {}
        for s_idx, ((spec, attr), _) in enumerate(
            plane_entries + y_entries + z_entries
        ):
            if attr == "const_static":
                bc_arrays[id(spec)] = side_vmem[s_idx]
            else:
                bc_factors[(id(spec), attr)] = side_vmem[s_idx]
        for j2, spec in enumerate(xt_pl):
            bc_arrays[id(spec)] = xt_vmem[j2]
        for j2, spec in enumerate(xt_y):
            bc_arrays[id(spec)] = xt_vmem[n_xpl + j2]
        for j2, spec in enumerate(xt_z):
            bc_arrays[id(spec)] = xt_vmem[n_xpl + n_xy + j2]
        helpers.bc_arrays = bc_arrays
        helpers.bc_factors = bc_factors

        one = np.int32(1)
        if ext_x:
            # shard-level x gates from the caller (program gating happens
            # inside the fixups); every shard spans all of y and z
            x_lo = jnp.where(flags_ref[0] != 0, one, 0)
            x_hi = jnp.where(flags_ref[1] != 0, one, 0)
        else:
            x_lo = x_hi = one
        helpers.flags = jnp.stack([
            x_lo, x_hi,
            jnp.where(j == 0, one, 0), jnp.where(j == n_yp - 1, one, 0),
            one, one,
        ])
        works = [blks[f][:, :, :] for f in range(F)]
        for s in range(k):
            helpers.step_idx = s
            if has_t:
                _set_t_slots(helpers, t_specs, t_tab, s)
            works = step(works)
        off = yh - halo
        for f in range(F):
            outs[f][:, :, :] = works[f][:, off : off + ny_c, :]

    ych_footprint = _ychunk_footprint(
        nz, band, ny_c, k, halo_per_step, F, np.dtype(dtype).itemsize
    ) + side_extra
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * F,
        grid=(n_xp, n_yp),
        in_specs=(
            ([pl.BlockSpec(memory_space=pltpu.SMEM)] if ext_x else [])
            + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
            + [pl.BlockSpec(memory_space=pl.ANY)]
            * (n_pl + n_y + n_z + n_xpl + n_xy + n_xz)
            + [pl.BlockSpec(memory_space=pl.ANY)] * F
        ),
        out_specs=[
            pl.BlockSpec(
                (band, ny_c, nz), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
        ] * F,
        scratch_shapes=(
            [pltpu.VMEM((band + 2 * halo, ny_c + 2 * yh, nz), dtype)] * F
            + [pltpu.VMEM((1, ny_c + 2 * yh, nz), dtype)] * n_pl
            + [pltpu.VMEM((band + 2 * halo, 1, nz), dtype)] * n_y
            + [pltpu.VMEM((band + 2 * halo, ny_c + 2 * yh, 128), dtype)]
            * n_z
            + [pltpu.VMEM((k, ny_c + 2 * yh, nz), dtype)] * n_xpl
            + [pltpu.VMEM((k, band + 2 * halo, 1, nz), dtype)] * n_xy
            + [pltpu.VMEM((k, band + 2 * halo, ny_c + 2 * yh, 128), dtype)]
            * n_xz
            + [pltpu.SemaphoreType.DMA((
                3 * (1 if ext_x else 3) * F
                + n_pl + n_y + n_z + n_xpl + n_xy + n_xz,
            ))]
        ),
        interpret=interpret,
        vmem_footprint=ych_footprint,
    )

    side_consts = [
        jnp.asarray(a, dtype=dtype)
        for _, a in plane_entries + y_entries + z_entries
    ]

    if ext_x:

        def window_k_ext(datas, edge_flags):
            out = call(
                jnp.asarray(edge_flags, jnp.int32),
                *[jnp.asarray(d, dtype=dtype) for d in datas],
            )
            return list(out)

        window_k_ext.t_specs = None
        window_k_ext.xt_entries = ()
        return window_k_ext, k

    if needs_runtime:

        def window_k_t(datas, xt_ops, t_tab=None):
            """``xt_ops``: one per-chunk table per ``window_k_t.xt_entries``
            entry (ax 0: (k, ny, nz); ax 1: (k, nx, nz); ax 2: (k, nx, ny))
            — wrap-padding (x by the staged halo, y by the chunk halo) and
            lane-broadcast happen here; the kernel DMA-slices each padded
            block to its (x band, y chunk) region."""
            xpl_ops, xy_ops, xz_ops = [], [], []
            for (ax, _), arr in zip(xt_entries, xt_ops, strict=True):
                arr = jnp.asarray(arr, dtype=dtype)
                if ax == 0:  # varies over the chunked y axis: wrap-pad y
                    xpl_ops.append(jnp.concatenate(
                        [arr[:, -yh:], arr, arr[:, :yh]], axis=1
                    ))
                    continue
                ext = jnp.concatenate(
                    [arr[:, -halo:], arr, arr[:, :halo]], axis=1
                )
                if ax == 1:
                    xy_ops.append(ext[:, :, None, :])
                else:  # varies over x AND y: pad both, broadcast lanes
                    ext = jnp.concatenate(
                        [ext[:, :, -yh:], ext, ext[:, :, :yh]], axis=2
                    )
                    xz_ops.append(jnp.broadcast_to(
                        ext[:, :, :, None], (*ext.shape, 128)
                    ))
            t_args = [jnp.asarray(t_tab, dtype=dtype)] if has_t else []
            out = call(
                *t_args, *side_consts, *xpl_ops, *xy_ops, *xz_ops,
                *[jnp.asarray(d, dtype=dtype) for d in datas],
            )
            return list(out)

        window_k_t.t_specs = tuple(t_specs) if has_t else None
        window_k_t.xt_entries = tuple(xt_entries)
        return window_k_t, k

    def window_k(datas):
        out = call(
            *side_consts, *[jnp.asarray(d, dtype=dtype) for d in datas]
        )
        return list(out)

    window_k.t_specs = None
    window_k.xt_entries = ()
    return window_k, k


def make_fused_multi_stencil_window_3d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    dtype=np.float32, k: int | None = None, interpret: bool = False,
    bc_inputs=None, ychunk: bool | None = None, stages_per_step: int = 1,
) -> tuple[Callable, int]:
    """3D temporal-blocking kernel over ``n_fields`` coupled field volumes.

    The 3D analogue of :func:`make_fused_multi_stencil_window_2d`: bands
    over x (the untiled major dim, so halos cost exactly the needed planes),
    y/z locally periodic via rolls with BC patches. ``make_step(helpers)``
    returns ``step(works) -> works`` shrinking x by ``2*halo_per_step``
    planes. This is what lets the expression compiler fuse 3D rhs trees —
    the reference compiles all its 3D stencils
    (`/root/reference/pde/backends/numba/operators/cartesian.py:109-192`).

    ``bc_inputs`` (:func:`collect_bc_side_inputs_3d` output) stages
    inhomogeneous per-boundary-FACE const arrays and t-dependent consts as
    kernel side inputs: x-side planes as one (1, ny, nz) VMEM block, y-side
    arrays as per-program (band + 2*halo, 1, nz) DMA slices of an
    x-wrap-padded block, z-side arrays as (band + 2*halo, ny, 128) slices
    of a lane-broadcast block (value in lane 0, like the 2D column vectors
    — Mosaic rejects width-1 memref slices), and t consts via an SMEM
    (k, n_t) table. With t entries the returned callable is
    ``window_k(datas, t_tab)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not isinstance(grid, CartesianGrid) or grid.num_axes != 3:
        raise PallasUnsupportedError("3D Cartesian grid required")
    nx, ny, nz = grid.shape
    itemsize = np.dtype(dtype).itemsize

    # y-chunked dispatch: scalar-affine, t-dependent, per-face ARRAY, and
    # (round-5) space-time BC consts all lower into the chunked kernel
    # (arrays and step-indexed xt tables stage as wrap-padded DMA-sliced
    # blocks); only multi-stage per-(step, stage) tables stay on the roll
    # path
    _xts = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    if ychunk is None or ychunk:
        # multi-stage steppers (fused RK4) bind per-stage t/xt tables
        # through helpers.bind_stage, which the y-chunked kernel does not
        # carry — those configs stay on the roll path
        _has_stage_tables = stages_per_step > 1 and bool(
            bc_inputs and (bc_inputs["t"] or _xts)
        )
        chunkable = not _has_stage_tables
        if ychunk and not chunkable:
            raise PallasUnsupportedError(
                "y-chunked 3D kernels take no multi-stage t/xt tables"
            )
        cfg = None
        if interpret:
            if ychunk:
                cfg = _ychunk_interpret_cfg(grid.shape, halo_per_step, k)
        elif (
            chunkable
            and jax.default_backend() == "tpu"
            and np.dtype(dtype) == np.dtype(np.float32)
        ):
            cfg = _pick_ychunk_3d(
                grid.shape, itemsize, halo_per_step, n_fields
            )
            if cfg is not None and ychunk is None:
                # auto mode: only chunk where the roll path degrades (plane
                # past the 96 KB k=4 threshold) — small planes keep the
                # cheaper single-grid kernel
                if (
                    ny * nz * n_fields * itemsize <= 96 * 1024
                    and _pick_band_k_3d((nx, ny, nz * n_fields), itemsize)
                    is not None
                ):
                    cfg = None
        if cfg is not None:
            c_band, c_nyc, c_k = cfg
            if k is not None:
                if not 1 <= k * halo_per_step <= c_k * halo_per_step:
                    raise PallasUnsupportedError(
                        f"k={k} unsupported for the y-chunked window"
                    )
                c_k = k
            try:
                return _make_ychunk_multi_window_3d(
                    grid, make_step, halo_per_step, n_fields, band=c_band,
                    ny_c=c_nyc, k=c_k, dtype=dtype, interpret=interpret,
                    bc_inputs=bc_inputs,
                )
            except PallasUnsupportedError:
                if ychunk:  # explicitly requested: propagate the refusal
                    raise
                # auto mode: e.g. side inputs over budget — roll path below
        if ychunk:
            raise PallasUnsupportedError(
                "No y-chunked configuration fits this grid"
            )

    if interpret:
        if k is None:
            k = max(1, 4 // halo_per_step)
        band = nx if nx <= 8 or nx % 8 else 8
        while nx % band:
            band //= 2
        if band < 1 or k * halo_per_step > nx:
            raise PallasUnsupportedError("Grid too small for the 3D window")
    else:
        if jax.default_backend() != "tpu":
            raise PallasUnsupportedError("TPU backend required")
        if nx % 8 != 0 or ny % 8 != 0 or nz % 128 != 0:
            raise PallasUnsupportedError("Unaligned 3D shape")
        # rolls on y/z: f32 only (Mosaic cannot rotate bf16)
        if np.dtype(dtype) != np.dtype(np.float32):
            raise PallasUnsupportedError("3D fused windows require float32")
        band_k = _pick_band_k_3d((nx, ny, nz * n_fields), itemsize)
        if band_k is None:
            raise PallasUnsupportedError("Plane too large for VMEM")
        band, k_max = band_k
        if k is None:
            k = max(1, k_max // halo_per_step)
            # staged BC side inputs live OUTSIDE the plane VMEM model and
            # scale with k (per-step xt tables + the k*hps halo padding):
            # shrink the temporal block until they fit instead of letting
            # the hard gate below reject the whole fused path (which only
            # fires on hardware — interpret mode skips it, so this was
            # caught by the real-TPU lane, not CPU CI)
            while k > 1 and _side_input_extra_3d(
                grid.shape, bc_inputs, band, k * stages_per_step,
                halo_per_step, itemsize
            ) > _SIDE_INPUT_BUDGET:
                k //= 2
        if not 1 <= k * halo_per_step <= k_max:
            raise PallasUnsupportedError(f"k={k} unsupported for this shape")
    halo = k * halo_per_step  # x is the major dim: no DMA granule
    if halo > band:
        raise PallasUnsupportedError(
            "Temporal block exceeds the band (wrapped halo DMAs would "
            "overrun the volume)"
        )
    n_programs = nx // band
    helpers = _make_stencil_helpers_3d(grid, pl, pltpu, band, n_programs)
    step = make_step(helpers)
    F = n_fields

    # staged side inputs for inhomogeneous / t-dependent BC consts and
    # array-valued factors (entries are (ax, spec, attr) triples);
    # space-and-time values arrive as per-chunk step-indexed RUNTIME
    # operands (one extra leading k dim per layout)
    arr_entries = [] if bc_inputs is None else bc_inputs["arrays"]
    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    xt_pl = [spec for ax, spec in xt_entries if ax == 0]
    xt_y = [spec for ax, spec in xt_entries if ax == 1]
    xt_z = [spec for ax, spec in xt_entries if ax == 2]
    n_xpl, n_xy, n_xz = len(xt_pl), len(xt_y), len(xt_z)
    has_t = bool(t_specs)
    needs_runtime = bool(has_t or xt_entries)
    plane_entries = []  # x sides: ((spec, attr), (1, ny, nz))
    y_entries = []  # y sides: ((spec, attr), (nx + 2*halo, 1, nz))
    z_entries = []  # z sides: ((spec, attr), (nx + 2*halo, ny, 128))
    for ax, spec, attr in arr_entries:
        arr = np.asarray(getattr(spec, attr), dtype=dtype)
        if ax == 0:
            plane_entries.append(((spec, attr), arr.reshape(1, ny, nz)))
            continue
        # wrap-pad x by the staged halo (the top/bot halo DMAs wrap)
        arr = arr.reshape(nx, -1)
        ext = np.concatenate([arr[-halo:], arr, arr[:halo]], axis=0)
        if ax == 1:
            y_entries.append(
                ((spec, attr), ext.reshape(nx + 2 * halo, 1, nz))
            )
        else:
            z_entries.append((
                (spec, attr),
                np.broadcast_to(
                    ext.reshape(nx + 2 * halo, ny, 1),
                    (nx + 2 * halo, ny, 128),
                ).copy(),
            ))
    n_pl, n_y, n_z = len(plane_entries), len(y_entries), len(z_entries)
    if not interpret and (n_pl or n_y or n_z or xt_entries):
        # side inputs live outside the _pick_band_k_3d VMEM model; bound
        # their footprint so a z-heavy config falls back instead of OOMing
        # (the k=None selection above already shrinks k to fit, so this
        # only fires for explicitly requested k)
        extra = _side_input_extra_3d(
            grid.shape, bc_inputs, band, k * stages_per_step,
            halo_per_step, itemsize
        )
        if extra > _SIDE_INPUT_BUDGET:
            raise PallasUnsupportedError(
                "3D BC value arrays exceed the side-input VMEM budget"
            )

    S = stages_per_step  # t/xt tables carry one row per (step, stage)

    def kernel(*refs):
        pos = 0
        if has_t:
            t_tab = refs[pos]
            pos += 1
        plane_refs = refs[pos : pos + n_pl]
        pos += n_pl
        xpl_refs = refs[pos : pos + n_xpl]
        pos += n_xpl
        y_hbm = refs[pos : pos + n_y + n_xy]
        pos += n_y + n_xy
        z_hbm = refs[pos : pos + n_z + n_xz]
        pos += n_z + n_xz
        ins = refs[pos : pos + F]
        outs = refs[pos + F : pos + 2 * F]
        pos += 2 * F
        band_refs = refs[pos : pos + F]
        tops = refs[pos + F : pos + 2 * F]
        bots = refs[pos + 2 * F : pos + 3 * F]
        pos += 3 * F
        y_vmem = refs[pos : pos + n_y + n_xy]
        pos += n_y + n_xy
        z_vmem = refs[pos : pos + n_z + n_xz]
        sem = refs[pos + n_z + n_xz]
        i = pl.program_id(0)
        row0 = i * band
        top_row = jax.lax.rem(row0 + np.int32(nx - halo), np.int32(nx))
        bot_row = jax.lax.rem(row0 + np.int32(band), np.int32(nx))
        copies = []
        for f in range(F):
            for j, (src, dst) in enumerate((
                (ins[f].at[pl.ds(pl.multiple_of(row0, band), band)], band_refs[f]),
                (ins[f].at[pl.ds(top_row, halo)], tops[f]),
                (ins[f].at[pl.ds(bot_row, halo)], bots[f]),
            )):
                cp = pltpu.make_async_copy(src, dst, sem.at[3 * f + j])
                cp.start()
                copies.append(cp)
        # per-program value slices covering [row0 - halo, row0 + band + halo)
        # of the x-wrap-padded blocks (staged offset +halo); step-indexed
        # xt blocks carry the x range in their SECOND dim
        for j, (src, dst) in enumerate(
            [(y_hbm[j2], y_vmem[j2]) for j2 in range(n_y)]
            + [(z_hbm[j2], z_vmem[j2]) for j2 in range(n_z)]
        ):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(row0, band + 2 * halo)], dst, sem.at[3 * F + j]
            )
            cp.start()
            copies.append(cp)
        for j, (src, dst) in enumerate(
            [(y_hbm[n_y + j2], y_vmem[n_y + j2]) for j2 in range(n_xy)]
            + [(z_hbm[n_z + j2], z_vmem[n_z + j2]) for j2 in range(n_xz)]
        ):
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(row0, band + 2 * halo)],
                dst,
                sem.at[3 * F + n_y + n_z + j],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        helpers.stage_x_halo = halo
        bc_arrays = {}
        bc_factors = {}

        def _route(spec, attr, ref):
            if attr == "const_static":
                bc_arrays[id(spec)] = ref
            else:
                bc_factors[(id(spec), attr)] = ref

        for j, ((spec, attr), _) in enumerate(plane_entries):
            _route(spec, attr, plane_refs[j])
        for j, spec in enumerate(xt_pl):
            bc_arrays[id(spec)] = xpl_refs[j]
        for j, ((spec, attr), _) in enumerate(y_entries):
            _route(spec, attr, y_vmem[j])
        for j, spec in enumerate(xt_y):
            bc_arrays[id(spec)] = y_vmem[n_y + j]
        for j, ((spec, attr), _) in enumerate(z_entries):
            _route(spec, attr, z_vmem[j])
        for j, spec in enumerate(xt_z):
            bc_arrays[id(spec)] = z_vmem[n_z + j]
        helpers.bc_arrays = bc_arrays
        helpers.bc_factors = bc_factors

        works = [
            jnp.concatenate(
                [tops[f][:, :, :], band_refs[f][:, :, :], bots[f][:, :, :]],
                axis=0,
            )
            for f in range(F)
        ]
        def _bind(idx):
            helpers.step_idx = idx
            if has_t:
                _set_t_slots(helpers, t_specs, t_tab, idx)

        for s in range(k):
            # multi-stage steppers (fused RK4) rebind mid-step through
            # helpers.bind_stage(j); stage 0 binds before each step call
            helpers.bind_stage = lambda j, _s=s: _bind(_s * S + j)
            helpers.bind_stage(0)
            works = step(works)
        for f in range(F):
            outs[f][:, :, :] = works[f]

    in_specs = (
        ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
        + [
            pl.BlockSpec(
                (1, ny, nz), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
        ] * n_pl
        + [
            pl.BlockSpec(
                (k * S, ny, nz), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * n_xpl
        + [pl.BlockSpec(memory_space=pl.ANY)] * (n_y + n_xy + n_z + n_xz)
        + [pl.BlockSpec(memory_space=pl.ANY)] * F
    )
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), dtype)] * F,
        grid=(nx // band,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (band, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ] * F,
        scratch_shapes=(
            [pltpu.VMEM((band, ny, nz), dtype)] * F
            + [pltpu.VMEM((halo, ny, nz), dtype)] * (2 * F)
            + [pltpu.VMEM((band + 2 * halo, 1, nz), dtype)] * n_y
            + [pltpu.VMEM((k * S, band + 2 * halo, 1, nz), dtype)] * n_xy
            + [pltpu.VMEM((band + 2 * halo, ny, 128), dtype)] * n_z
            + [pltpu.VMEM((k * S, band + 2 * halo, ny, 128), dtype)] * n_xz
            + [pltpu.SemaphoreType.DMA(
                (3 * F + n_y + n_z + n_xy + n_xz,)
            )]
        ),
        interpret=interpret,
    )

    plane_consts = [jnp.asarray(a, dtype=dtype) for _, a in plane_entries]
    y_consts = [jnp.asarray(a, dtype=dtype) for _, a in y_entries]
    z_consts = [jnp.asarray(a, dtype=dtype) for _, a in z_entries]

    if needs_runtime:

        def window_k_t(datas, xt_ops, t_tab=None):
            """``xt_ops``: one per-chunk table per ``window_k_t.xt_entries``
            entry (ax 0: (k, ny, nz); ax 1: (k, nx, nz); ax 2:
            (k, nx, ny)) — x-wrap-padding and lane-broadcast happen here."""
            xpl_ops, xy_ops, xz_ops = [], [], []
            for (ax, _), arr in zip(xt_entries, xt_ops, strict=True):
                arr = jnp.asarray(arr, dtype=dtype)
                if ax == 0:
                    xpl_ops.append(arr)
                    continue
                ext = jnp.concatenate(
                    [arr[:, -halo:], arr, arr[:, :halo]], axis=1
                )
                if ax == 1:
                    xy_ops.append(ext[:, :, None, :])
                else:
                    xz_ops.append(
                        jnp.broadcast_to(
                            ext[:, :, :, None], (*ext.shape, 128)
                        )
                    )
            t_args = [jnp.asarray(t_tab, dtype=dtype)] if has_t else []
            out = call(
                *t_args, *plane_consts, *xpl_ops, *y_consts, *xy_ops,
                *z_consts, *xz_ops,
                *[jnp.asarray(d, dtype=dtype) for d in datas],
            )
            return list(out)

        window_k_t.t_specs = tuple(t_specs) if has_t else None
        window_k_t.xt_entries = tuple(xt_entries)
        return window_k_t, k

    def window_k(datas):
        out = call(
            *plane_consts, *y_consts, *z_consts,
            *[jnp.asarray(d, dtype=dtype) for d in datas],
        )
        return list(out)

    window_k.t_specs = None
    window_k.xt_entries = ()
    return window_k, k


def make_chunked_multi_window_3d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    dtype=np.float32, interpret: bool = False, bc_inputs=None, dt=None,
    ychunk: bool | None = None, stage_offsets=None,
) -> Callable:
    """Return ``window(datas, steps)`` chunking steps into 3D kernel calls.

    With time-dependent BC consts in ``bc_inputs`` the window instead has
    signature ``window(datas, t0, steps)`` (attribute ``needs_t``) and
    rebuilds the per-step SMEM const table from ``t0`` per chunk (see
    :func:`make_chunked_multi_window_2d`, incl. the ``stage_offsets``
    semantics for multi-stage steppers)."""
    offsets = tuple(stage_offsets) if stage_offsets is not None else (0.0,)
    S = len(offsets)
    _, k = make_fused_multi_stencil_window_3d(
        grid, make_step, halo_per_step, n_fields, dtype=dtype,
        interpret=interpret, bc_inputs=bc_inputs, ychunk=ychunk,
        stages_per_step=S,
    )

    def build(kk):
        step, _ = make_fused_multi_stencil_window_3d(
            grid, make_step, halo_per_step, n_fields, dtype=dtype, k=kk,
            interpret=interpret, bc_inputs=bc_inputs, ychunk=ychunk,
            stages_per_step=S,
        )
        if step.t_specs is None and not step.xt_entries:
            return lambda d: tuple(step(list(d)))
        return lambda d, xt_ops, t_tab: tuple(step(list(d), xt_ops, t_tab))

    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    if not t_specs and not xt_entries:
        window_t = _make_binary_chunked_window(build, k)

        def window(datas, steps):
            return list(window_t(tuple(datas), steps))

        return window

    if dt is None:
        raise ValueError("dt is required for time-dependent BC windows")
    kernels = _binary_kernel_ladder(build, k)
    t_funcs = _t_slot_funcs(t_specs)
    xt_info = []
    for ax, spec in xt_entries:
        face = tuple(n for d, n in enumerate(grid.shape) if d != ax)
        xt_info.append((spec.const_xt, face))

    def make_t_tab(ts):
        if not t_funcs:
            return None
        return jnp.stack([jax.vmap(fn)(ts) for fn in t_funcs], axis=1)

    def make_xt_ops(ts):
        # const_xt returns flattened per-face values; reshape to the face
        return [
            jax.vmap(fn)(ts).reshape(ts.shape[0], *face)
            for fn, face in xt_info
        ]

    stage_frac = jnp.asarray(offsets)

    def window_td(datas, t0, steps):
        state = tuple(datas)
        index = jnp.asarray(0, jnp.int32)
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk

            def body(c, carry, _kk=kk, _step=step_fn):
                d, idx = carry
                # (step, stage)-major rows: stage j of inner step s reads
                # row s*S + j (S == 1: the plain per-step table)
                base = t0 + (idx + jnp.arange(_kk)) * dt
                ts = (base[:, None] + stage_frac[None, :] * dt).reshape(-1)
                return (
                    _step(d, make_xt_ops(ts), make_t_tab(ts)), idx + _kk
                )

            state, index = jax.lax.fori_loop(0, chunks, body, (state, index))
            remaining = remaining - chunks * kk
        return list(state)

    window_td.needs_t = True
    return window_td


def _pick_band_ext_3d(
    nx: int, ny_e: int, nz_e: int, ny: int, nz: int, itemsize: int,
    halo: int, n_fields: int,
) -> int | None:
    """Output-plane band dividing nx for the 3D halo-extended multi kernel.

    VMEM footprint per program: F extended scratch volumes, F double-buffered
    output bands, and ~3 live work temporaries of the extended volume (the
    same accounting as :func:`_pick_band_ext`, per plane instead of per row).
    """

    def footprint(band):
        scratch = n_fields * (band + 2 * halo) * ny_e * nz_e
        outs = n_fields * 2 * band * ny * nz
        temps = 3 * (band + 2 * halo) * ny_e * nz_e
        return (scratch + outs + temps) * itemsize

    for candidate in (8, 4, 2, 1):
        if nx % candidate == 0 and footprint(candidate) <= _VMEM_BUDGET:
            return candidate
    return None


def make_fused_multi_ext_window_3d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    local_shape, ext_axes=(True, False, False), dtype=np.float32,
    k: int | None = None, interpret: bool = False, bc_inputs=None,
    stages_per_step: int = 1,
) -> tuple[Callable, int]:
    """3D multi-field temporal-blocking kernel on halo-extended local blocks.

    The decomposed (shard_map) variant of
    :func:`make_fused_multi_stencil_window_3d`: each input carries
    ``k*halo_per_step`` halo planes per side along x (the banded DMA axis —
    x is untiled, so halos cost exactly the needed planes) and, where
    ``ext_axes`` marks y/z decomposed, the same halo there (filled by
    ppermute outside; the wrapper zero-pads extended y/z to the (8, 128)
    tiling granule). Non-extended y/z stay locally periodic via rolls with
    edge-flag-gated BC patches. ``grid`` is the GLOBAL grid (providing the
    discretization); ``local_shape`` the shard's extent. The returned
    ``window_k(datas, edge_flags)`` takes the int32 ``(6,)`` global-edge
    flag array ``[x_lo, x_hi, y_lo, y_hi, z_lo, z_hi]`` — the reference
    runs its 3D stencils under MPI with full BC support
    (`/root/reference/pde/backends/numba_mpi/backend.py:163-195`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lx, ly, lz = local_shape
    ext_y, ext_z = bool(ext_axes[1]), bool(ext_axes[2])
    itemsize = np.dtype(dtype).itemsize
    if k is None:
        k = max(1, 4 // halo_per_step)
    halo = k * halo_per_step  # x is untiled: no DMA granule
    # nearest-neighbor exchange must be able to supply the whole halo
    if lx < halo or (ext_y and ly < halo) or (ext_z and lz < halo):
        raise PallasUnsupportedError("Shard too small for the halo exchange")
    ny_in = ly + 2 * halo if ext_y else ly
    nz_in = lz + 2 * halo if ext_z else lz
    if interpret:
        ny_e, nz_e = ny_in, nz_in
        band = lx if lx <= 8 or lx % 8 else 8
        while lx % band:
            band //= 2
    else:
        if jax.default_backend() != "tpu":
            raise PallasUnsupportedError("TPU backend required")
        # rolls on non-extended y/z: f32 only (Mosaic cannot rotate bf16)
        if np.dtype(dtype) != np.dtype(np.float32):
            raise PallasUnsupportedError("3D fused windows require float32")
        if lx % 8 != 0 or (not ext_y and ly % 8 != 0) or (
            not ext_z and lz % 128 != 0
        ):
            raise PallasUnsupportedError("Unaligned 3D local shape")
        ny_e = -(-ny_in // 8) * 8 if ext_y else ny_in
        nz_e = -(-nz_in // 128) * 128 if ext_z else nz_in
        band = _pick_band_ext_3d(
            lx, ny_e, nz_e, ly, lz, itemsize, halo, n_fields
        )
        if band is None:
            raise PallasUnsupportedError("Plane too large for VMEM")
    n_programs = lx // band
    helpers = _make_stencil_helpers_3d(
        grid, pl, pltpu, band, n_programs,
        ext_y=ext_y, ext_z=ext_z, ny=ly, nz=lz,
    )
    step = make_step(helpers)
    F = n_fields

    # runtime side inputs for inhomogeneous / t-dependent BC consts: values
    # are shard-varying, so the caller supplies LOCAL (halo-extended along
    # decomposed axes, x-wrap-padded) per-face arrays at call time — ax 0
    # as a (ny_in, nz_in) plane, ax 1 as (lx + 2*halo, nz_in), ax 2 as
    # (lx + 2*halo, ny_in) (lane-broadcast inside the wrapper)
    arr_entries = [] if bc_inputs is None else list(bc_inputs["arrays"])
    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    xt_pl = [spec for ax, spec in xt_entries if ax == 0]
    xt_y = [spec for ax, spec in xt_entries if ax == 1]
    xt_z = [spec for ax, spec in xt_entries if ax == 2]
    n_xpl, n_xy, n_xz = len(xt_pl), len(xt_y), len(xt_z)
    has_t = bool(t_specs)
    needs_runtime = bool(has_t or xt_entries)
    plane_entries = [
        (spec, attr) for ax, spec, attr in arr_entries if ax == 0
    ]
    y_entries = [(spec, attr) for ax, spec, attr in arr_entries if ax == 1]
    z_entries = [(spec, attr) for ax, spec, attr in arr_entries if ax == 2]
    n_pl, n_y, n_z = len(plane_entries), len(y_entries), len(z_entries)
    S = stages_per_step  # t/xt tables carry one row per (step, stage)
    if not interpret and (n_pl or n_y or n_z or xt_entries):
        extra = (
            (n_pl + n_xpl * k * S) * ny_e * nz_e
            + (n_y + n_xy * k * S) * (band + 2 * halo) * nz_e
            + (n_z + n_xz * k * S) * (band + 2 * halo) * ny_e * 128
        ) * itemsize
        if extra > 2 * 1024 * 1024:
            raise PallasUnsupportedError(
                "3D BC value arrays exceed the side-input VMEM budget"
            )

    def kernel(flags_ref, *refs):
        pos = 0
        if has_t:
            t_tab = refs[pos]
            pos += 1
        plane_refs = refs[pos : pos + n_pl]
        pos += n_pl
        xpl_refs = refs[pos : pos + n_xpl]
        pos += n_xpl
        y_hbm = refs[pos : pos + n_y + n_xy]
        pos += n_y + n_xy
        z_hbm = refs[pos : pos + n_z + n_xz]
        pos += n_z + n_xz
        ins = refs[pos : pos + F]
        outs = refs[pos + F : pos + 2 * F]
        pos += 2 * F
        work_refs = refs[pos : pos + F]
        pos += F
        y_vmem = refs[pos : pos + n_y + n_xy]
        pos += n_y + n_xy
        z_vmem = refs[pos : pos + n_z + n_xz]
        sem = refs[pos + n_z + n_xz]
        helpers.flags = flags_ref
        i = pl.program_id(0)
        row0 = i * band  # input planes [row0, row0 + band + 2*halo)
        copies = []
        for f in range(F):
            cp = pltpu.make_async_copy(
                ins[f].at[pl.ds(pl.multiple_of(row0, band), band + 2 * halo)],
                work_refs[f],
                sem.at[f],
            )
            cp.start()
            copies.append(cp)
        for j, (src, dst) in enumerate(
            [(y_hbm[j2], y_vmem[j2]) for j2 in range(n_y)]
            + [(z_hbm[j2], z_vmem[j2]) for j2 in range(n_z)]
        ):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(pl.multiple_of(row0, band), band + 2 * halo)],
                dst,
                sem.at[F + j],
            )
            cp.start()
            copies.append(cp)
        # step-indexed xt blocks carry the x range in their SECOND dim
        for j, (src, dst) in enumerate(
            [(y_hbm[n_y + j2], y_vmem[n_y + j2]) for j2 in range(n_xy)]
            + [(z_hbm[n_z + j2], z_vmem[n_z + j2]) for j2 in range(n_xz)]
        ):
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(pl.multiple_of(row0, band), band + 2 * halo)],
                dst,
                sem.at[F + n_y + n_z + j],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        helpers.stage_x_halo = halo
        helpers.stage_y_halo = halo if ext_y else 0
        helpers.stage_z_halo = halo if ext_z else 0
        bc_arrays = {}
        bc_factors = {}

        def _route(spec, attr, ref):
            if attr == "const_static":
                bc_arrays[id(spec)] = ref
            else:
                bc_factors[(id(spec), attr)] = ref

        for j, (spec, attr) in enumerate(plane_entries):
            _route(spec, attr, plane_refs[j])
        for j, spec in enumerate(xt_pl):
            bc_arrays[id(spec)] = xpl_refs[j]
        for j, (spec, attr) in enumerate(y_entries):
            _route(spec, attr, y_vmem[j])
        for j, spec in enumerate(xt_y):
            bc_arrays[id(spec)] = y_vmem[n_y + j]
        for j, (spec, attr) in enumerate(z_entries):
            _route(spec, attr, z_vmem[j])
        for j, spec in enumerate(xt_z):
            bc_arrays[id(spec)] = z_vmem[n_z + j]
        helpers.bc_arrays = bc_arrays
        helpers.bc_factors = bc_factors

        works = [work_refs[f][:, :ny_in, :nz_in] for f in range(F)]

        def _bind(idx):
            helpers.step_idx = idx
            if has_t:
                _set_t_slots(helpers, t_specs, t_tab, idx)

        for s in range(k):
            # multi-stage steppers (fused RK4) rebind mid-step through
            # helpers.bind_stage(j); stage 0 binds before each step call
            helpers.bind_stage = lambda j, _s=s: _bind(_s * S + j)
            helpers.bind_stage(0)
            works = step(works)
        for f in range(F):
            outs[f][:, :, :] = works[f]

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
        + [
            pl.BlockSpec(
                (1, ny_e, nz_e), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
        ] * n_pl
        + [
            pl.BlockSpec(
                (k * S, ny_e, nz_e), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] * n_xpl
        + [pl.BlockSpec(memory_space=pl.ANY)] * (n_y + n_xy + n_z + n_xz)
        + [pl.BlockSpec(memory_space=pl.ANY)] * F
    )
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=[jax.ShapeDtypeStruct((lx, ly, lz), dtype)] * F,
        grid=(lx // band,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (band, ly, lz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ] * F,
        scratch_shapes=(
            [pltpu.VMEM((band + 2 * halo, ny_e, nz_e), dtype)] * F
            + [pltpu.VMEM((band + 2 * halo, 1, nz_e), dtype)] * n_y
            + [pltpu.VMEM((k * S, band + 2 * halo, 1, nz_e), dtype)] * n_xy
            + [pltpu.VMEM((band + 2 * halo, ny_e, 128), dtype)] * n_z
            + [pltpu.VMEM((k * S, band + 2 * halo, ny_e, 128), dtype)]
            * n_xz
            + [pltpu.SemaphoreType.DMA((F + n_y + n_z + n_xy + n_xz,))]
        ),
        interpret=interpret,
    )

    pad_y = ny_e - ny_in
    pad_z = nz_e - nz_in
    no_edges = jnp.zeros((6,), jnp.int32)

    def window_k(datas, edge_flags=None, *extra):
        """``extra``: one LOCAL value array per ``window_k.array_entries``
        entry (ax 0: (ny_in, nz_in); ax 1: (lx + 2*halo, nz_in); ax 2:
        (lx + 2*halo, ny_in)), then one LOCAL per-chunk table per
        ``window_k.xt_entries`` entry (same extents with a leading ``k``
        dim), then a (k, n_t) t-table when ``window_k.t_specs``."""
        arrs = [jnp.asarray(d, dtype=dtype) for d in datas]
        if pad_y or pad_z:
            arrs = [
                jnp.pad(d, ((0, 0), (0, pad_y), (0, pad_z))) for d in arrs
            ]
        flags = no_edges if edge_flags is None else jnp.asarray(
            edge_flags, jnp.int32
        )
        n_arr = n_pl + n_y + n_z
        n_xt = n_xpl + n_xy + n_xz
        supplied = list(extra[:n_arr])
        xt_supplied = list(extra[n_arr : n_arr + n_xt])
        t_args = []
        if has_t:
            t_args = [jnp.asarray(extra[n_arr + n_xt], dtype=dtype)]
        pl_ops, y_ops, z_ops = [], [], []
        for (ax, _, _), arr in zip(arr_entries, supplied, strict=True):
            arr = jnp.asarray(arr, dtype=dtype)
            if ax == 0:
                arr = jnp.pad(
                    arr, ((0, ny_e - arr.shape[0]), (0, nz_e - arr.shape[1]))
                )
                pl_ops.append(arr[None])
            elif ax == 1:
                arr = jnp.pad(arr, ((0, 0), (0, nz_e - arr.shape[1])))
                y_ops.append(arr[:, None, :])
            else:
                arr = jnp.pad(arr, ((0, 0), (0, ny_e - arr.shape[1])))
                z_ops.append(
                    jnp.broadcast_to(arr[:, :, None], (*arr.shape, 128))
                )
        xpl_ops, xy_ops, xz_ops = [], [], []
        for (ax, _), arr in zip(xt_entries, xt_supplied, strict=True):
            arr = jnp.asarray(arr, dtype=dtype)
            if ax == 0:
                arr = jnp.pad(
                    arr,
                    ((0, 0), (0, ny_e - arr.shape[1]),
                     (0, nz_e - arr.shape[2])),
                )
                xpl_ops.append(arr)
            elif ax == 1:
                arr = jnp.pad(arr, ((0, 0), (0, 0), (0, nz_e - arr.shape[2])))
                xy_ops.append(arr[:, :, None, :])
            else:
                arr = jnp.pad(arr, ((0, 0), (0, 0), (0, ny_e - arr.shape[2])))
                xz_ops.append(
                    jnp.broadcast_to(arr[:, :, :, None], (*arr.shape, 128))
                )
        return list(
            call(flags, *t_args, *pl_ops, *xpl_ops, *y_ops, *xy_ops,
                 *z_ops, *xz_ops, *arrs)
        )

    window_k.array_entries = tuple(arr_entries)
    window_k.xt_entries = tuple(xt_entries)
    window_k.t_specs = tuple(t_specs) if has_t else None
    window_k.halo = halo
    return window_k, k


def make_fused_multi_stencil_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    dtype=np.float32, k: int | None = None, interpret: bool = False,
    bc_inputs=None, stages_per_step: int = 1,
) -> tuple[Callable, int]:
    """Temporal-blocking kernel over ``n_fields`` coupled field planes.

    ``make_step(helpers)`` must return ``step(works) -> works`` mapping a list
    of ``n_fields`` work arrays to new ones, each shrunk by
    ``2*halo_per_step`` rows (the helpers provide 5-point laplace, squared
    gradient, and central derivatives; columns are periodic via lane rolls).
    All fields share one HBM pass per k steps: each program issues 3 DMAs per
    field (band + two 8-row halos) and writes each band once. Covers coupled
    systems (reaction-diffusion, wave; reference 2-field states,
    `/root/reference/pde/pdes/wave.py:25`). Returns (window_k(datas) -> list,
    k).

    ``bc_inputs`` (:func:`collect_bc_side_inputs` output) stages
    inhomogeneous per-boundary-point const arrays and time-dependent consts
    as kernel side inputs — row-side arrays as (1, n_cols) VMEM blocks,
    column-side arrays as per-program DMA slices of a halo-extended value
    vector broadcast across one 128-lane tile, t-consts via an SMEM
    ``(k, n_t)`` table (column order = ``bc_inputs["t"]``). With t entries
    the returned callable is ``window_k(datas, t_tab)``.

    ``stages_per_step`` sizes the t/xt tables for multi-stage steppers
    (fused RK4 needs ghost values at ``t``, ``t + dt/2`` and ``t + dt``,
    matching the unfused tableau — the reference re-evaluates every BC per
    rhs call, `/root/reference/pde/backends/numba/_solvers.py:67-120`):
    tables carry ``k * stages_per_step`` rows and ``step(works)`` may call
    ``helpers.bind_stage(j)`` between its internal rhs evaluations to bind
    stage ``j``'s row; each step implicitly starts bound to stage 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..grids.cylindrical import CylindricalSymGrid

    grid_cls = (CartesianGrid, CylindricalSymGrid)
    if not isinstance(grid, grid_cls) or grid.num_axes != 2:
        raise PallasUnsupportedError("2D Cartesian/cylindrical grid required")
    n_rows, n_cols = grid.shape
    itemsize = np.dtype(dtype).itemsize
    k_defaulted = k is None
    if k is None:
        # one 8-row halo granule per side: k=16 measured slower here (the
        # per-field VMEM working set doubles and the kernel is VPU-bound)
        k = max(1, _HALO // halo_per_step)
    # periodicity is not required here: non-periodic axes are handled by the
    # BC-aware helpers (the caller passes affine ghost params per operator)
    if interpret:
        geometry_ok = lambda kk: _fused_geometry_ok(
            n_rows, n_cols * n_fields, itemsize, kk * halo_per_step
        )
        while k_defaulted and k > 1 and not geometry_ok(k):
            k //= 2
        if not geometry_ok(k):
            raise PallasUnsupportedError(
                "Grid too small for the k-step band/halo geometry"
            )
    elif not _supports_fused_shape_2d(
        grid, dtype, k * halo_per_step, grid_cls=grid_cls
    ):
        raise PallasUnsupportedError(
            "Fused stencil window requires a 2D Cartesian/cylindrical grid "
            "with aligned shape and float32/bfloat16 data on a TPU backend"
        )
    if k_defaulted and not interpret and bc_inputs is not None:
        # staged BC side inputs live OUTSIDE the _pick_band model and scale
        # with k (xt step tables + halo padding): shrink the temporal block
        # until they fit instead of letting the hard gate below reject the
        # fused path outright (hardware-lane finding — interpret skips it)
        def _extra(kk):
            ht = kk * halo_per_step
            return _side_input_extra_2d(
                bc_inputs, n_cols,
                _pick_band(n_rows, n_cols * n_fields, itemsize, ht),
                -(-ht // _HALO) * _HALO, kk * stages_per_step, itemsize,
            )

        while k > 1 and _extra(k) > _SIDE_INPUT_BUDGET:
            k //= 2
    # scale the VMEM budget by the number of resident field planes
    band = _pick_band(n_rows, n_cols * n_fields, itemsize, k * halo_per_step)
    helpers = _make_stencil_helpers(grid, pl, pltpu, band, n_rows // band)
    step = make_step(helpers)
    halo_total = k * halo_per_step
    halo = -(-halo_total // _HALO) * _HALO  # rounded to the DMA granule
    F = n_fields

    # staged side inputs for inhomogeneous / t-dependent BC consts; array
    # FACTORS (Robin with per-point gamma) stage identically, bound into
    # helpers.bc_factors under (id(spec), attr) keys
    arr_entries = [] if bc_inputs is None else bc_inputs["arrays"]
    fac_entries = [] if bc_inputs is None else bc_inputs.get("factors", [])
    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    has_t = bool(t_specs)
    row_entries = []  # (('a'|'f', key), (1, n_cols) block)
    col_entries = []  # (('a'|'f', key), (n_rows + 2*halo, 128) ext block)

    def _stage(kind, key, values):
        arr = np.asarray(values, dtype=dtype).reshape(-1)
        if kind == "row":
            row_entries.append((key, arr.reshape(1, n_cols)))
        else:
            # wrap-pad by the staging halo; Mosaic rejects width-1 memref
            # slices, so broadcast across one 128-lane tile (kernel value-
            # slices lane 0) — same staging as make_affine_laplace_2d
            ext = np.concatenate([arr[-halo:], arr, arr[:halo]])
            col_entries.append(
                (key, np.broadcast_to(ext.reshape(-1, 1), (ext.size, 128)).copy())
            )

    for kind, spec in arr_entries:
        _stage(kind, ("a", id(spec)), spec.const_static)
    for kind, spec, attr in fac_entries:
        _stage(kind, ("f", (id(spec), attr)), getattr(spec, attr))
    n_row_in, n_col_in = len(row_entries), len(col_entries)
    # space-AND-time consts: per-chunk tables as RUNTIME operands, one row
    # per temporal-block step (row-side (k, n_cols) VMEM blocks; column-side
    # (k, n_rows + 2*halo, 128) HBM blocks DMA-sliced per program)
    xt_row_specs = [spec for kind, spec in xt_entries if kind == "row"]
    xt_col_specs = [spec for kind, spec in xt_entries if kind == "col"]
    n_xtr, n_xtc = len(xt_row_specs), len(xt_col_specs)
    S = stages_per_step  # t/xt tables carry one row per (step, stage)
    if not interpret and (n_row_in or n_col_in or n_xtr or n_xtc):
        # side inputs live OUTSIDE the _pick_band footprint model: bound
        # them so a value-heavy config falls back instead of hard-failing
        # at Mosaic compile (the clean-fallback invariant)
        extra = (
            n_row_in * n_cols
            + n_xtr * k * S * n_cols
            + n_col_in * (band + 2 * halo) * 128
            + n_xtc * k * S * (band + 2 * halo) * 128
        ) * itemsize
        if extra > 2 * 1024 * 1024:
            raise PallasUnsupportedError(
                "BC value side inputs exceed the VMEM budget"
            )

    def kernel(*refs):
        pos = 0
        if has_t:
            t_tab = refs[pos]
            pos += 1
        row_refs = refs[pos : pos + n_row_in]
        pos += n_row_in
        xtr_refs = refs[pos : pos + n_xtr]
        pos += n_xtr
        col_hbm = refs[pos : pos + n_col_in]
        pos += n_col_in
        xtc_hbm = refs[pos : pos + n_xtc]
        pos += n_xtc
        ins = refs[pos : pos + F]
        outs = refs[pos + F : pos + 2 * F]
        pos += 2 * F
        band_refs = refs[pos : pos + F]
        tops = refs[pos + F : pos + 2 * F]
        bots = refs[pos + 2 * F : pos + 3 * F]
        pos += 3 * F
        col_vmem = refs[pos : pos + n_col_in]
        xtc_vmem = refs[pos + n_col_in : pos + n_col_in + n_xtc]
        sem = refs[pos + n_col_in + n_xtc]
        i = pl.program_id(0)
        row0 = i * band
        top_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(n_rows - halo), np.int32(n_rows)), 8
        )
        bot_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(band), np.int32(n_rows)), 8
        )
        copies = []
        for f in range(F):
            for j, (src, dst) in enumerate((
                (ins[f].at[pl.ds(pl.multiple_of(row0, 8), band), :], band_refs[f]),
                (ins[f].at[pl.ds(top_row, halo), :], tops[f]),
                (ins[f].at[pl.ds(bot_row, halo), :], bots[f]),
            )):
                cp = pltpu.make_async_copy(src, dst, sem.at[3 * f + j])
                cp.start()
                copies.append(cp)
        for j in range(n_col_in):
            # value-vector rows matching this program's work region
            # [row0 - halo, row0 + band + halo) — extended-block offset +halo
            cp = pltpu.make_async_copy(
                col_hbm[j].at[pl.ds(pl.multiple_of(row0, 8), band + 2 * halo), :],
                col_vmem[j],
                sem.at[3 * F + j],
            )
            cp.start()
            copies.append(cp)
        for j in range(n_xtc):
            cp = pltpu.make_async_copy(
                xtc_hbm[j].at[
                    :, pl.ds(pl.multiple_of(row0, 8), band + 2 * halo), :
                ],
                xtc_vmem[j],
                sem.at[3 * F + n_col_in + j],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        helpers.stage_row_halo = halo
        bc_arrays = {}
        bc_factors = {}
        for j, (key, _) in enumerate(row_entries):
            (bc_arrays if key[0] == "a" else bc_factors)[key[1]] = row_refs[j]
        for j, (key, _) in enumerate(col_entries):
            (bc_arrays if key[0] == "a" else bc_factors)[key[1]] = col_vmem[j]
        for j, spec in enumerate(xt_row_specs):
            bc_arrays[id(spec)] = xtr_refs[j]
        for j, spec in enumerate(xt_col_specs):
            bc_arrays[id(spec)] = xtc_vmem[j]
        helpers.bc_arrays = bc_arrays
        helpers.bc_factors = bc_factors

        works = [
            jnp.concatenate(
                [
                    tops[f][halo - halo_total :, :],
                    band_refs[f][:, :],
                    bots[f][:halo_total, :],
                ],
                axis=0,
            )
            for f in range(F)
        ]

        def _bind(idx):
            helpers.step_idx = idx
            if has_t:
                _set_t_slots(helpers, t_specs, t_tab, idx)

        for s in range(k):
            # multi-stage steppers (fused RK4) rebind mid-step through
            # helpers.bind_stage(j); stage 0 is bound before each step call
            # (S == 1 reduces to the plain per-step binding)
            helpers.bind_stage = lambda j, _s=s: _bind(_s * S + j)
            helpers.bind_stage(0)
            works = step(works)
        for f in range(F):
            outs[f][:, :] = works[f]

    in_specs = (
        ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
        + [
            pl.BlockSpec((1, n_cols), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] * n_row_in
        + [
            pl.BlockSpec(
                (k * S, n_cols), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ] * n_xtr
        + [pl.BlockSpec(memory_space=pl.ANY)] * (n_col_in + n_xtc)
        + [pl.BlockSpec(memory_space=pl.ANY)] * F
    )
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n_rows, n_cols), dtype)] * F,
        grid=(n_rows // band,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * F,
        scratch_shapes=(
            [pltpu.VMEM((band, n_cols), dtype)] * F
            + [pltpu.VMEM((halo, n_cols), dtype)] * (2 * F)
            + [pltpu.VMEM((band + 2 * halo, 128), dtype)] * n_col_in
            + [pltpu.VMEM((k * S, band + 2 * halo, 128), dtype)] * n_xtc
            + [pltpu.SemaphoreType.DMA((3 * F + n_col_in + n_xtc,))]
        ),
        interpret=interpret,
    )

    row_consts = [jnp.asarray(a, dtype=dtype) for _, a in row_entries]
    col_consts = [jnp.asarray(a, dtype=dtype) for _, a in col_entries]

    if has_t or xt_entries:

        def window_k_t(datas, xt_ops, t_tab=None):
            """``xt_ops``: per-chunk (k, n) value tables, one per
            ``window_k_t.xt_entries`` entry (row-side (k, n_cols);
            column-side (k, n_rows), wrap-padded + lane-broadcast here)."""
            xtr, xtc = [], []
            for (kind, _), arr in zip(xt_entries, xt_ops, strict=True):
                arr = jnp.asarray(arr, dtype=dtype)
                if kind == "row":
                    xtr.append(arr)
                else:
                    ext = jnp.concatenate(
                        [arr[:, -halo:], arr, arr[:, :halo]], axis=1
                    )
                    xtc.append(
                        jnp.broadcast_to(
                            ext[:, :, None], (*ext.shape, 128)
                        )
                    )
            t_args = (
                [jnp.asarray(t_tab, dtype=dtype)] if has_t else []
            )
            out = call(
                *t_args, *row_consts, *xtr, *col_consts, *xtc,
                *[jnp.asarray(d, dtype=dtype) for d in datas],
            )
            return list(out)

        window_k_t.t_specs = tuple(t_specs) if has_t else None
        window_k_t.xt_entries = tuple(xt_entries)
        return window_k_t, k

    def window_k(datas):
        out = call(
            *row_consts, *col_consts,
            *[jnp.asarray(d, dtype=dtype) for d in datas],
        )
        return list(out)

    window_k.t_specs = None
    window_k.xt_entries = ()
    return window_k, k


def make_fused_multi_ext_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    local_rows: int, local_cols: int | None = None, ext_cols: bool = False,
    dtype=np.float32, k: int | None = None, interpret: bool = False,
    bc_inputs=None, stages_per_step: int = 1,
) -> tuple[Callable, int]:
    """Multi-field temporal-blocking kernel on halo-extended local blocks.

    The decomposed (shard_map) variant of
    :func:`make_fused_multi_stencil_window_2d`: each input carries
    ``ext_halo_width(k*halo_per_step)`` halo rows per side (filled by
    ppermute outside) and, with ``ext_cols``, the same column halo (grids cut
    along the column axis); otherwise columns stay locally periodic via lane
    rolls. All fields share one HBM pass per k steps. ``grid`` is the GLOBAL
    grid (providing the discretization); ``local_rows``/``local_cols`` are
    the shard's extent. Physical (const-affine) BCs are supported through
    the helpers' ``bc=`` parameters, gated by the ``edge_flags`` int32
    ``(5,)`` array ``[row_lo, row_hi, col_lo, col_hi, row_offset]`` marking
    GLOBAL domain edges — the returned ``window_k(datas, edge_flags)``
    mirrors the single-field ext kernel's contract.

    ``bc_inputs`` (:func:`collect_bc_side_inputs` output) declares
    inhomogeneous per-boundary-point and t-dependent BC consts; their
    values are shard-varying and therefore arrive as RUNTIME operands:
    ``window_k(datas, edge_flags, *extra)`` takes one LOCAL value array per
    ``window_k.array_entries`` entry (row-side ``(cols_ext,)``, column-side
    ``(local_rows + 2*halo,)``; see the attribute docs), then a ``(k, n_t)``
    t-table when ``window_k.t_specs`` is set.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k_defaulted = k is None
    if k is None:
        k = max(1, _HALO // halo_per_step)
    n_cols = grid.shape[1] if local_cols is None else local_cols
    if not interpret:
        if jax.default_backend() != "tpu":
            raise PallasUnsupportedError("TPU backend required")
        if (
            local_rows % 8 != 0
            or (not ext_cols and n_cols % 128 != 0)
            or np.dtype(dtype) not in (
                [np.dtype(np.float32), np.dtype(jnp.bfloat16)]
                if ext_cols  # roll-free column path; rolls reject bf16
                else [np.dtype(np.float32)]
            )
            # the ext halo is fixed at _HALO rows on TPU, so the temporal
            # block must fit inside it: halo_total > _HALO would make the
            # work-region slice start negative and silently wrap
            or not 1 <= k * halo_per_step <= _HALO
        ):
            raise PallasUnsupportedError(
                "Unsupported local shape/dtype for the multi-field ext kernel"
            )
    halo_total = k * halo_per_step
    halo = ext_halo_width(halo_total, interpret=interpret)
    if local_rows < halo or (ext_cols and n_cols < halo):
        raise PallasUnsupportedError("Shard too small for the halo exchange")
    itemsize = np.dtype(dtype).itemsize
    S = stages_per_step  # t/xt tables carry one row per (step, stage)
    # lane extent of the padded input (multiple of 128 on TPU)
    cols_ext = n_cols + 2 * halo if ext_cols else n_cols
    lanes = cols_ext if interpret else -(-cols_ext // 128) * 128
    band = _pick_band_ext(local_rows, lanes * n_fields, itemsize, halo)
    helpers = _make_stencil_helpers(
        grid, pl, pltpu, band, local_rows // band,
        ext_cols=ext_cols, n_cols=n_cols,
    )
    step = make_step(helpers)
    F = n_fields

    # runtime side inputs for inhomogeneous / t-dependent BC consts AND
    # array-valued factors: values are shard-varying, so the caller
    # supplies LOCAL (halo-extended) slices at call time (sliced from
    # host-precomputed GLOBAL arrays by lax.axis_index, per the
    # bit-identity rule). Entries are (kind, spec, attr) with attr
    # "const_static"/"f1"/"f2".
    arr_entries = (
        []
        if bc_inputs is None
        else [
            (kind, spec, "const_static")
            for kind, spec in bc_inputs["arrays"]
        ]
        + [
            (kind, spec, attr)
            for kind, spec, attr in bc_inputs.get("factors", [])
        ]
    )
    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    has_t = bool(t_specs)
    row_keys = [
        (spec, attr) for kind, spec, attr in arr_entries if kind == "row"
    ]
    col_keys = [
        (spec, attr) for kind, spec, attr in arr_entries if kind == "col"
    ]
    n_row_in, n_col_in = len(row_keys), len(col_keys)
    xt_row_specs = [spec for kind, spec in xt_entries if kind == "row"]
    xt_col_specs = [spec for kind, spec in xt_entries if kind == "col"]
    n_xtr, n_xtc = len(xt_row_specs), len(xt_col_specs)
    if not interpret and (n_row_in or n_col_in or n_xtr or n_xtc):
        # side inputs live OUTSIDE the _pick_band_ext footprint model (see
        # the stencil window's identical gate). When k was defaulted,
        # shrink the temporal block until the xt step tables fit (the ext
        # halo is pinned at _HALO on TPU, so band/helpers stay valid)
        def _extra(kk):
            return (
                (n_row_in + n_xtr * kk) * lanes
                + (n_col_in + n_xtc * kk) * (band + 2 * halo) * 128
            ) * itemsize

        if k_defaulted:
            while k > 1 and _extra(k) > _SIDE_INPUT_BUDGET:
                k //= 2
            halo_total = k * halo_per_step
        if _extra(k) > _SIDE_INPUT_BUDGET:
            raise PallasUnsupportedError(
                "BC value side inputs exceed the VMEM budget"
            )

    def kernel(flags_ref, *refs):
        pos = 0
        if has_t:
            t_tab = refs[pos]
            pos += 1
        row_refs = refs[pos : pos + n_row_in]
        pos += n_row_in
        xtr_refs = refs[pos : pos + n_xtr]
        pos += n_xtr
        col_hbm = refs[pos : pos + n_col_in]
        pos += n_col_in
        xtc_hbm = refs[pos : pos + n_xtc]
        pos += n_xtc
        ins = refs[pos : pos + F]
        outs = refs[pos + F : pos + 2 * F]
        pos += 2 * F
        work_refs = refs[pos : pos + F]
        pos += F
        col_vmem = refs[pos : pos + n_col_in]
        xtc_vmem = refs[pos + n_col_in : pos + n_col_in + n_xtc]
        sem = refs[pos + n_col_in + n_xtc]
        helpers.flags = flags_ref
        i = pl.program_id(0)
        row0 = i * band  # input rows [row0, row0 + band + 2*halo)
        copies = []
        for f in range(F):
            cp = pltpu.make_async_copy(
                ins[f].at[pl.ds(pl.multiple_of(row0, band), band + 2 * halo), :],
                work_refs[f],
                sem.at[f],
            )
            cp.start()
            copies.append(cp)
        for j in range(n_col_in):
            # value-vector rows matching this program's input rows
            cp = pltpu.make_async_copy(
                col_hbm[j].at[
                    pl.ds(pl.multiple_of(row0, band), band + 2 * halo), :
                ],
                col_vmem[j],
                sem.at[F + j],
            )
            cp.start()
            copies.append(cp)
        for j in range(n_xtc):
            cp = pltpu.make_async_copy(
                xtc_hbm[j].at[
                    :, pl.ds(pl.multiple_of(row0, band), band + 2 * halo), :
                ],
                xtc_vmem[j],
                sem.at[F + n_col_in + j],
            )
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

        helpers.stage_row_halo = halo
        helpers.stage_col_halo = halo if ext_cols else 0
        bc_arrays = {}
        bc_factors = {}
        for j, (spec, attr) in enumerate(row_keys):
            if attr == "const_static":
                bc_arrays[id(spec)] = row_refs[j]
            else:
                bc_factors[(id(spec), attr)] = row_refs[j]
        for j, (spec, attr) in enumerate(col_keys):
            if attr == "const_static":
                bc_arrays[id(spec)] = col_vmem[j]
            else:
                bc_factors[(id(spec), attr)] = col_vmem[j]
        for j, spec in enumerate(xt_row_specs):
            bc_arrays[id(spec)] = xtr_refs[j]
        for j, spec in enumerate(xt_col_specs):
            bc_arrays[id(spec)] = xtc_vmem[j]
        helpers.bc_arrays = bc_arrays
        helpers.bc_factors = bc_factors

        col_sl = (
            slice(halo - halo_total, halo + halo_total + n_cols)
            if ext_cols
            else slice(None, n_cols)
        )
        works = [
            work_refs[f][halo - halo_total : halo + halo_total + band, col_sl]
            for f in range(F)
        ]

        def _bind(idx):
            helpers.step_idx = idx
            if has_t:
                _set_t_slots(helpers, t_specs, t_tab, idx)

        for s in range(k):
            # multi-stage steppers (fused RK4) rebind mid-step through
            # helpers.bind_stage(j); stage 0 binds before each step call
            helpers.bind_stage = lambda j, _s=s: _bind(_s * S + j)
            helpers.bind_stage(0)
            works = step(works)
        for f in range(F):
            outs[f][:, :] = works[f]

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
        + [
            pl.BlockSpec((1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ] * n_row_in
        + [
            pl.BlockSpec(
                (k * S, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ] * n_xtr
        + [pl.BlockSpec(memory_space=pl.ANY)] * (n_col_in + n_xtc)
        + [pl.BlockSpec(memory_space=pl.ANY)] * F
    )
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=[jax.ShapeDtypeStruct((local_rows, n_cols), dtype)] * F,
        grid=(local_rows // band,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * F,
        scratch_shapes=(
            [pltpu.VMEM((band + 2 * halo, lanes), dtype)] * F
            + [pltpu.VMEM((band + 2 * halo, 128), dtype)] * n_col_in
            + [pltpu.VMEM((k * S, band + 2 * halo, 128), dtype)] * n_xtc
            + [pltpu.SemaphoreType.DMA((F + n_col_in + n_xtc,))]
        ),
        interpret=interpret,
    )

    pad_lanes = lanes - cols_ext
    no_edges = jnp.zeros((5,), jnp.int32)

    def window_k(datas, edge_flags=None, *extra):
        """``extra``: one LOCAL value array per ``window_k.array_entries``
        entry (row-side ``(cols_ext,)``, column-side
        ``(local_rows + 2*halo,)``), then the ``(k, n_t)`` t-table when
        ``window_k.t_specs``."""
        arrs = [jnp.asarray(d, dtype=dtype) for d in datas]
        if pad_lanes:
            arrs = [jnp.pad(d, ((0, 0), (0, pad_lanes))) for d in arrs]
        flags = no_edges if edge_flags is None else jnp.asarray(
            edge_flags, jnp.int32
        )
        n_arr = n_row_in + n_col_in
        n_xt = n_xtr + n_xtc
        supplied = list(extra[:n_arr])
        xt_supplied = list(extra[n_arr : n_arr + n_xt])
        t_args = []
        if has_t:
            t_args = [jnp.asarray(extra[n_arr + n_xt], dtype=dtype)]
        row_ops, col_ops = [], []
        for (kind, _, _), arr in zip(arr_entries, supplied, strict=True):
            arr = jnp.asarray(arr, dtype=dtype)
            if kind == "row":
                arr = arr.reshape(1, -1)
                if arr.shape[1] < lanes:
                    arr = jnp.pad(arr, ((0, 0), (0, lanes - arr.shape[1])))
                row_ops.append(arr)
            else:
                # broadcast across one 128-lane tile: Mosaic rejects width-1
                # memref slices; the kernel value-slices lane 0
                col_ops.append(
                    jnp.broadcast_to(arr.reshape(-1, 1), (arr.shape[0], 128))
                )
        xtr_ops, xtc_ops = [], []
        for (kind, _), arr in zip(xt_entries, xt_supplied, strict=True):
            arr = jnp.asarray(arr, dtype=dtype)
            if kind == "row":
                if arr.shape[1] < lanes:
                    arr = jnp.pad(arr, ((0, 0), (0, lanes - arr.shape[1])))
                xtr_ops.append(arr)
            else:
                xtc_ops.append(
                    jnp.broadcast_to(arr[:, :, None], (*arr.shape, 128))
                )
        return list(
            call(flags, *t_args, *row_ops, *xtr_ops, *col_ops, *xtc_ops, *arrs)
        )

    window_k.array_entries = tuple(arr_entries)  # (kind, spec, attr) triples
    window_k.xt_entries = tuple(xt_entries)
    window_k.t_specs = tuple(t_specs) if has_t else None
    window_k.halo = halo
    return window_k, k


def _make_kernel_noise_gen(pltpu, dist: str):
    """Return ``gen(shape) -> unit-variance increments`` drawn from the
    in-kernel TPU PRNG (``pltpu.prng_random_bits``; caller seeds first).

    The laws mirror :func:`pde_tpu.models.base.make_increment_draw` — weak
    order 1 of Euler-Maruyama needs only the Gaussian's first three moments
    (Kloeden & Platen), so the cheap laws are admissible increments.
    Measured generation rates at 4096 lanes, band 64 (one v5e chip,
    scripts/experiment_sde_noise.py): box-muller 1.65e10, irwin4 3.40e10,
    rademacher 2.42e10 samples/s against a 3.95e10 raw-bits floor — the
    transcendentals, not the PRNG, dominate the exact-Gaussian cost.
    """
    import jax
    import jax.numpy as jnp

    two24 = np.float32(2.0**-24)

    def _to_f32(u32):
        # Mosaic has no uint32->f32 cast; values below 2^31 go via int32
        return pltpu.bitcast(u32, jnp.int32).astype(jnp.float32)

    def uniform(shape):
        bits = pltpu.prng_random_bits(shape)
        return (
            _to_f32(
                jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.uint32), np.uint32(8)
                )
            )
            * two24
        )

    if dist == "normal":  # Box-Muller

        def gen(shape):
            u1 = jnp.maximum(uniform(shape), two24)
            u2 = uniform(shape)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            return r * jnp.cos((2.0 * np.pi) * u2)

    elif dist == "irwin4":
        sqrt3 = np.float32(np.sqrt(3.0))

        def gen(shape):
            s = uniform(shape)
            for _ in range(3):
                s = s + uniform(shape)
            return (s - 2.0) * sqrt3

    elif dist == "rademacher":

        def gen(shape):
            bits = pltpu.prng_random_bits(shape)
            sign = _to_f32(
                jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.uint32), np.uint32(31)
                )
            )
            return 1.0 - 2.0 * sign

    else:
        raise PallasUnsupportedError(
            f"No in-kernel generator for increment law {dist!r}"
        )

    return gen


class _BCSideStager2D:
    """Staging of inhomogeneous/t-dependent BC consts (and array factors)
    for the single-field 2D SDE kernels — the same layouts as
    :func:`make_fused_multi_stencil_window_2d`: row-side (1, n_cols) VMEM
    blocks, column-side per-program DMA slices of a halo-extended
    lane-broadcast vector, t consts via an SMEM (k, n_t) table, and
    space-AND-time values as per-chunk step-indexed tables (row-side
    (k, n_cols) VMEM; column-side (k, rows, 128) DMA slices) supplied as
    RUNTIME operands by the chunked window."""

    def __init__(self, bc_inputs, n_cols, halo, dtype, k=None):
        self.t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
        self.xt_entries = (
            [] if bc_inputs is None else list(bc_inputs.get("xt", []))
        )
        if self.xt_entries and k is None:
            raise PallasUnsupportedError(
                "Space-and-time-dependent BC values need the temporal "
                "block size at staging time"
            )
        self.k = k
        self.n_cols = n_cols
        self.has_t = bool(self.t_specs)
        self.halo = halo
        self.row_entries: list = []
        self.col_entries: list = []
        self.xt_row_specs = [
            spec for kind, spec in self.xt_entries if kind == "row"
        ]
        self.xt_col_specs = [
            spec for kind, spec in self.xt_entries if kind == "col"
        ]
        self.n_xtr = len(self.xt_row_specs)
        self.n_xtc = len(self.xt_col_specs)

        def stage(kind, key, values):
            arr = np.asarray(values, dtype=dtype).reshape(-1)
            if kind == "row":
                self.row_entries.append((key, arr.reshape(1, n_cols)))
            else:
                ext = np.concatenate([arr[-halo:], arr, arr[:halo]])
                self.col_entries.append((
                    key,
                    np.broadcast_to(
                        ext.reshape(-1, 1), (ext.size, 128)
                    ).copy(),
                ))

        for kind, spec in [] if bc_inputs is None else bc_inputs["arrays"]:
            stage(kind, ("a", id(spec)), spec.const_static)
        for kind, spec, attr in (
            [] if bc_inputs is None else bc_inputs.get("factors", [])
        ):
            stage(kind, ("f", (id(spec), attr)), getattr(spec, attr))
        self.n_row = len(self.row_entries)
        self.n_col = len(self.col_entries)
        self.active = bool(
            self.has_t or self.n_row or self.n_col or self.xt_entries
        )
        self.needs_runtime = bool(self.has_t or self.xt_entries)

    def in_specs(self, pl, pltpu, n_cols):
        return (
            ([pl.BlockSpec(memory_space=pltpu.SMEM)] if self.has_t else [])
            + [
                pl.BlockSpec(
                    (1, n_cols), lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            ] * self.n_row
            + [
                pl.BlockSpec(
                    (self.k, n_cols), lambda i: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            ] * self.n_xtr
            + [pl.BlockSpec(memory_space=pl.ANY)] * (self.n_col + self.n_xtc)
        )

    def scratch(self, pltpu, band, dtype):
        return (
            [pltpu.VMEM((band + 2 * self.halo, 128), dtype)] * self.n_col
            + [
                pltpu.VMEM((self.k, band + 2 * self.halo, 128), dtype)
            ] * self.n_xtc
        )

    @property
    def n_scratch(self):
        return self.n_col + self.n_xtc

    def unpack(self, refs):
        """(t_tab, row_refs, col_hbm, n_consumed) from the leading refs
        (``row_refs`` covers static rows then xt rows; ``col_hbm`` static
        cols then xt cols)."""
        pos = 0
        t_tab = None
        if self.has_t:
            t_tab = refs[0]
            pos = 1
        row_refs = refs[pos : pos + self.n_row + self.n_xtr]
        pos += self.n_row + self.n_xtr
        col_hbm = refs[pos : pos + self.n_col + self.n_xtc]
        return t_tab, row_refs, col_hbm, pos + self.n_col + self.n_xtc

    def start_copies(self, pl, pltpu, row0, band, col_hbm, col_vmem, sem,
                     base):
        copies = []
        for j in range(self.n_col):
            cp = pltpu.make_async_copy(
                col_hbm[j].at[
                    pl.ds(pl.multiple_of(row0, 8), band + 2 * self.halo), :
                ],
                col_vmem[j],
                sem.at[base + j],
            )
            cp.start()
            copies.append(cp)
        for j in range(self.n_xtc):
            cp = pltpu.make_async_copy(
                col_hbm[self.n_col + j].at[
                    :, pl.ds(pl.multiple_of(row0, 8), band + 2 * self.halo), :
                ],
                col_vmem[self.n_col + j],
                sem.at[base + self.n_col + j],
            )
            cp.start()
            copies.append(cp)
        return copies

    def bind(self, helpers, row_refs, col_vmem):
        helpers.stage_row_halo = self.halo
        bc_arrays = {}
        bc_factors = {}
        for j, (key, _) in enumerate(self.row_entries):
            (bc_arrays if key[0] == "a" else bc_factors)[key[1]] = row_refs[j]
        for j, spec in enumerate(self.xt_row_specs):
            bc_arrays[id(spec)] = row_refs[self.n_row + j]
        for j, (key, _) in enumerate(self.col_entries):
            (bc_arrays if key[0] == "a" else bc_factors)[key[1]] = col_vmem[j]
        for j, spec in enumerate(self.xt_col_specs):
            bc_arrays[id(spec)] = col_vmem[self.n_col + j]
        helpers.bc_arrays = bc_arrays
        helpers.bc_factors = bc_factors

    def set_step(self, helpers, t_tab, s):
        helpers.step_idx = s
        if self.has_t:
            _set_t_slots(helpers, self.t_specs, t_tab, s)

    def vmem_check(self, band, itemsize, interpret):
        """Raise when the staged side inputs would overflow the scoped-VMEM
        budget: they live OUTSIDE the _pick_band footprint model, so a
        value-heavy config must fall back to XLA instead of hard-failing
        at Mosaic compile (the clean-fallback invariant)."""
        if interpret:
            return
        k = self.k or 1
        extra = (
            self.n_row * self.n_cols
            + self.n_xtr * k * self.n_cols
            + self.n_col * (band + 2 * self.halo) * 128
            + self.n_xtc * k * (band + 2 * self.halo) * 128
        ) * itemsize
        if extra > 2 * 1024 * 1024:
            raise PallasUnsupportedError(
                "BC value side inputs exceed the VMEM budget"
            )

    def runtime_operands(self, xt_ops, t_tab, dtype):
        """Assemble the leading runtime kernel operands for one chunk:
        ``xt_ops`` holds one per-chunk (k, n) table per ``self.xt_entries``
        entry (the chunked window evaluates ``spec.const_xt`` over the
        chunk's step times); row tables pass through, column tables are
        wrap-padded and lane-broadcast here."""
        xtr, xtc = [], []
        for (kind, _), arr in zip(self.xt_entries, xt_ops, strict=True):
            arr = jnp.asarray(arr, dtype=dtype)
            if kind == "row":
                xtr.append(arr)
            else:
                ext = jnp.concatenate(
                    [arr[:, -self.halo :], arr, arr[:, : self.halo]], axis=1
                )
                xtc.append(
                    jnp.broadcast_to(ext[:, :, None], (*ext.shape, 128))
                )
        t_args = (
            [jnp.asarray(t_tab, dtype=dtype)] if self.has_t else []
        )
        return t_args, xtr, xtc

    def host_operands(self, dtype):
        return [
            jnp.asarray(a, dtype=dtype) for _, a in self.row_entries
        ] + [jnp.asarray(a, dtype=dtype) for _, a in self.col_entries]


def make_fused_sde_kernel_noise_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, *,
    dist: str, scale: float, dtype=np.float32, k: int | None = None,
    bc_inputs=None,
) -> tuple[Callable, int]:
    """Temporal-blocking Euler-Maruyama window with IN-KERNEL noise.

    Unlike :func:`make_fused_sde_stencil_window_2d` (increments staged
    through HBM), each step's increments are drawn from the TPU hardware
    PRNG inside the kernel and never touch HBM.  Cross-band consistency:
    halo rows recompute the neighbor band's updates, so every band that
    touches global row ``r`` at step ``s`` must add the same increment —
    the PRNG is therefore re-seeded per (seed, global step, 8-row global
    granule) and drawn in (8, n_cols) granule blocks, making the stream a
    pure function of the global row index (independent of the band size
    picked).  The stream does NOT match the XLA path's threefry stream
    (weak-scheme statistics only); no interpret-mode lowering exists for
    ``pltpu.prng_seed``/``prng_random_bits``, so this variant is
    hardware-only.  Returned ``window_k(data, ctl) -> data`` takes
    ``ctl`` = int32 ``(seed_a, seed_b, global_step_base)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not isinstance(grid, CartesianGrid) or grid.num_axes != 2:
        raise PallasUnsupportedError("2D Cartesian grid required")
    n_rows, n_cols = grid.shape
    itemsize = np.dtype(dtype).itemsize
    if k is None:
        k = max(1, _HALO // halo_per_step)
    if not _supports_fused_shape_2d(grid, dtype, k * halo_per_step):
        raise PallasUnsupportedError(
            "Fused SDE window requires a 2D Cartesian grid with aligned "
            "shape and float32/bfloat16 data on a TPU backend"
        )
    # the (band + 2*halo, n_cols) noise plane replaces the external path's
    # (k, ...) block: model it as one extra live work-region temporary
    band = _pick_band(
        n_rows, n_cols + -(-n_cols // 3), itemsize, k * halo_per_step
    )
    helpers = _make_stencil_helpers(grid, pl, pltpu, band, n_rows // band)
    step = make_step(helpers)
    gen = _make_kernel_noise_gen(pltpu, dist)
    halo_total = k * halo_per_step
    halo = -(-halo_total // _HALO) * _HALO
    scale = np.dtype(dtype).type(scale)
    n_ext = band + 2 * halo
    assert n_ext % _HALO == 0
    stager = _BCSideStager2D(bc_inputs, n_cols, halo, dtype, k=k)
    stager.vmem_check(band, itemsize, False)  # hardware-only kernel

    def kernel(*refs):
        ctl_ref = refs[0]
        t_tab, row_refs, col_hbm, pos = stager.unpack(refs[1:])
        pos += 1
        f_hbm, out_ref = refs[pos : pos + 2]
        band_ref, halo_top, halo_bot, noise_ref = refs[pos + 2 : pos + 6]
        col_vmem = refs[pos + 6 : pos + 6 + stager.n_scratch]
        sem = refs[pos + 6 + stager.n_scratch]
        i = pl.program_id(0)
        row0 = i * band
        top_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(n_rows - halo), np.int32(n_rows)), 8
        )
        bot_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(band), np.int32(n_rows)), 8
        )
        copies = []
        for src_ref, dst in (
            (f_hbm.at[pl.ds(pl.multiple_of(row0, 8), band), :], band_ref),
            (f_hbm.at[pl.ds(top_row, halo), :], halo_top),
            (f_hbm.at[pl.ds(bot_row, halo), :], halo_bot),
        ):
            cp = pltpu.make_async_copy(src_ref, dst, sem.at[len(copies)])
            cp.start()
            copies.append(cp)
        copies += stager.start_copies(
            pl, pltpu, row0, band, col_hbm, col_vmem, sem, 3
        )
        for cp in copies:
            cp.wait()

        stager.bind(helpers, row_refs, col_vmem)
        work = jnp.concatenate(
            [halo_top[halo - halo_total :, :], band_ref[:, :],
             halo_bot[:halo_total, :]],
            axis=0,
        )
        for s in range(k):
            # draw this step's increments for the full extended row range
            # into VMEM, one 8-row global granule at a time (fori_loop keeps
            # the Mosaic program small — irwin4 draws 4 PRNG blocks/granule)
            def gen_body(j, _, _s=s):
                row_g = jax.lax.rem(
                    row0 + np.int32(n_rows - halo) + 8 * j, np.int32(n_rows)
                )
                # Mosaic accepts at most 2 seed words: fold the global step
                # and granule in via odd-multiplier Weyl mixing (bijective
                # mod 2^32, so distinct (step, granule) pairs give distinct
                # word pairs; the PRNG decorrelates nearby seeds)
                step_mixed = ctl_ref[0] + (
                    ctl_ref[2] + np.int32(_s)
                ) * np.int32(-1640531527)  # 0x9E3779B9
                gran_mixed = ctl_ref[1] + (row_g // 8) * np.int32(
                    -2048144789  # 0x85EBCA6B
                )
                pltpu.prng_seed(step_mixed, gran_mixed)
                noise_ref[pl.ds(pl.multiple_of(8 * j, 8), 8), :] = (
                    gen((8, n_cols)) * scale
                ).astype(dtype)
                return 0

            jax.lax.fori_loop(0, n_ext // 8, gen_body, 0)
            stager.set_step(helpers, t_tab, s)
            work = step(work)
            margin = halo_total - (s + 1) * halo_per_step
            work = work + noise_ref[halo - margin : halo + band + margin, :]
        out_ref[:, :] = work

    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        grid=(n_rows // band,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + stager.in_specs(pl, pltpu, n_cols)
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, n_cols), dtype),
            pltpu.VMEM((halo, n_cols), dtype),
            pltpu.VMEM((halo, n_cols), dtype),
            pltpu.VMEM((n_ext, n_cols), dtype),
        ] + stager.scratch(pltpu, band, dtype) + [
            pltpu.SemaphoreType.DMA((3 + stager.n_scratch,)),
        ],
        # no interpret-mode lowering exists for the hardware PRNG
        interpret=False,
    )

    consts = stager.host_operands(dtype)

    if stager.needs_runtime:

        def window_k_t(data, ctl, xt_ops, t_tab=None):
            t_args, xtr, xtc = stager.runtime_operands(xt_ops, t_tab, dtype)
            row_consts = consts[: stager.n_row]
            col_consts = consts[stager.n_row :]
            return call(
                jnp.asarray(ctl, jnp.int32),
                *t_args, *row_consts, *xtr, *col_consts, *xtc,
                jnp.asarray(data, dtype=dtype),
            )

        window_k_t.t_specs = tuple(stager.t_specs) if stager.has_t else None
        window_k_t.xt_entries = tuple(stager.xt_entries)
        return window_k_t, k

    def window_k(data, ctl):
        return call(
            jnp.asarray(ctl, jnp.int32), *consts,
            jnp.asarray(data, dtype=dtype),
        )

    window_k.t_specs = None
    window_k.xt_entries = ()
    return window_k, k


def make_fused_sde_stencil_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, *, dtype=np.float32,
    k: int | None = None, interpret: bool = False, bc_inputs=None,
) -> tuple[Callable, int]:
    """Temporal-blocking Euler-Maruyama window: deterministic stencil steps
    plus pre-scaled additive noise increments supplied as a kernel input.

    ``make_step(helpers)`` is the deterministic step (as in
    :func:`make_fused_stencil_window_2d`); the returned
    ``window_k(data, noise) -> data`` consumes ``noise`` of shape
    ``(k, n, m)`` holding the already-scaled increments for the k steps and
    adds plane ``s`` after step ``s`` — matching the unfused stepper's
    ``y + dt*rate + noise_step(...)`` exactly, so trajectories are
    bit-comparable against the XLA path given the same noise stream. The
    noise is generated OUTSIDE the kernel (XLA threefry) because the Pallas
    PRNG primitives have no interpret-mode lowering; traffic is one noise
    read per step against 2/k field passes. Reference equivalent: noise
    inside the compiled MPI stepper (`backends/numba/_solvers.py`).

    ``bc_inputs`` (:func:`collect_bc_side_inputs` output, no xt entries)
    stages inhomogeneous/t-dependent BC consts like the deterministic
    multi window; with t entries the callable is
    ``window_k(data, noise, t_tab)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not isinstance(grid, CartesianGrid) or grid.num_axes != 2:
        raise PallasUnsupportedError("2D Cartesian grid required")
    n_rows, n_cols = grid.shape
    itemsize = np.dtype(dtype).itemsize
    k_defaulted = k is None
    if k is None:
        k = max(1, _HALO // halo_per_step)
    if interpret:
        # the (k, band+2*halo, n_cols) noise block shares the VMEM budget,
        # so the effective column count is k-dependent (mirrors _pick_band
        # below)
        geometry_ok = lambda kk: _fused_geometry_ok(
            n_rows, n_cols * (kk + 1), itemsize, kk * halo_per_step
        )
        while k_defaulted and k > 1 and not geometry_ok(k):
            k //= 2
        if not geometry_ok(k):
            raise PallasUnsupportedError(
                "Grid too small for the k-step band/halo geometry"
            )
    elif not _supports_fused_shape_2d(grid, dtype, k * halo_per_step):
        raise PallasUnsupportedError(
            "Fused SDE window requires a 2D Cartesian grid with aligned "
            "shape and float32/bfloat16 data on a TPU backend"
        )
    # the (k, band+2*halo, n_cols) noise block lives in VMEM alongside the
    # field buffers: scale the budget accordingly
    band = _pick_band(n_rows, n_cols * (k + 1), itemsize, k * halo_per_step)
    helpers = _make_stencil_helpers(grid, pl, pltpu, band, n_rows // band)
    step = make_step(helpers)
    halo_total = k * halo_per_step
    halo = -(-halo_total // _HALO) * _HALO
    stager = _BCSideStager2D(bc_inputs, n_cols, halo, dtype, k=k)
    stager.vmem_check(band, itemsize, interpret)

    def kernel(*refs):
        t_tab, row_refs, col_hbm, pos = stager.unpack(refs)
        f_hbm, noise_hbm, out_ref = refs[pos : pos + 3]
        band_ref, halo_top, halo_bot, noise_ref = refs[pos + 3 : pos + 7]
        col_vmem = refs[pos + 7 : pos + 7 + stager.n_scratch]
        sem = refs[pos + 7 + stager.n_scratch]
        i = pl.program_id(0)
        row0 = i * band
        top_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(n_rows - halo), np.int32(n_rows)), 8
        )
        bot_row = pl.multiple_of(
            jax.lax.rem(row0 + np.int32(band), np.int32(n_rows)), 8
        )
        copies = []
        for src_ref, dst in (
            (f_hbm.at[pl.ds(pl.multiple_of(row0, 8), band), :], band_ref),
            (f_hbm.at[pl.ds(top_row, halo), :], halo_top),
            (f_hbm.at[pl.ds(bot_row, halo), :], halo_bot),
        ):
            cp = pltpu.make_async_copy(src_ref, dst, sem.at[len(copies)])
            cp.start()
            copies.append(cp)
        # noise block: rows [row0-halo, row0+band+halo) of every plane, with
        # periodic wraparound (halo rows recompute the neighbor's updates, so
        # they must see the NEIGHBOR'S noise — the same global stream)
        for part, (src_row, dst_lo, dst_hi) in enumerate((
            (top_row, 0, halo),
            (pl.multiple_of(row0, 8), halo, halo + band),
            (bot_row, halo + band, band + 2 * halo),
        )):
            cp = pltpu.make_async_copy(
                noise_hbm.at[:, pl.ds(src_row, dst_hi - dst_lo), :],
                noise_ref.at[:, pl.ds(dst_lo, dst_hi - dst_lo), :],
                sem.at[3 + part],
            )
            cp.start()
            copies.append(cp)
        copies += stager.start_copies(
            pl, pltpu, row0, band, col_hbm, col_vmem, sem, 6
        )
        for cp in copies:
            cp.wait()

        stager.bind(helpers, row_refs, col_vmem)
        work = jnp.concatenate(
            [halo_top[halo - halo_total :, :], band_ref[:, :],
             halo_bot[:halo_total, :]],
            axis=0,
        )
        for s in range(k):
            stager.set_step(helpers, t_tab, s)
            work = step(work)
            # after step s the work spans rows
            # [row0 - (halo_total - (s+1)*hps), row0 + band + ...): slice the
            # matching rows out of the noise plane (stored with `halo` rows
            # of margin on each side)
            margin = halo_total - (s + 1) * halo_per_step
            noise_slab = noise_ref[
                s, halo - margin : halo + band + margin, :
            ]
            work = work + noise_slab
        out_ref[:, :] = work

    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        grid=(n_rows // band,),
        in_specs=stager.in_specs(pl, pltpu, n_cols) + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band, n_cols), dtype),
            pltpu.VMEM((halo, n_cols), dtype),
            pltpu.VMEM((halo, n_cols), dtype),
            pltpu.VMEM((k, band + 2 * halo, n_cols), dtype),
        ] + stager.scratch(pltpu, band, dtype) + [
            pltpu.SemaphoreType.DMA((6 + stager.n_scratch,)),
        ],
        interpret=interpret,
    )

    consts = stager.host_operands(dtype)

    if stager.needs_runtime:

        def window_k_t(data, noise, xt_ops, t_tab=None):
            t_args, xtr, xtc = stager.runtime_operands(xt_ops, t_tab, dtype)
            row_consts = consts[: stager.n_row]
            col_consts = consts[stager.n_row :]
            return call(
                *t_args, *row_consts, *xtr, *col_consts, *xtc,
                jnp.asarray(data, dtype=dtype),
                jnp.asarray(noise, dtype=dtype),
            )

        window_k_t.t_specs = tuple(stager.t_specs) if stager.has_t else None
        window_k_t.xt_entries = tuple(stager.xt_entries)
        return window_k_t, k

    def window_k(data, noise):
        return call(
            *consts, jnp.asarray(data, dtype=dtype),
            jnp.asarray(noise, dtype=dtype),
        )

    window_k.t_specs = None
    window_k.xt_entries = ()
    return window_k, k


def make_chunked_sde_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, noise_fn, *,
    dtype=np.float32, interpret: bool = False, kernel_noise=None,
    bc_inputs=None, dt=None,
) -> Callable:
    """Return ``window(data, key, steps)`` for Euler-Maruyama stepping.

    ``noise_fn(key, indices) -> (len(indices), n, m)`` must produce the
    pre-scaled increments for the given global step indices using the SAME
    per-index key folding as the unfused stepper, so fused and unfused runs
    follow identical trajectories.

    ``kernel_noise={"dist": ..., "scale": ...}`` switches to the hardware
    in-kernel PRNG variant instead (see
    :func:`make_fused_sde_kernel_noise_window_2d`): ``noise_fn`` is unused,
    the stream is derived from ``key`` via two raw bit words, and
    trajectories match the XLA path only in distribution.

    ``bc_inputs`` (:func:`collect_bc_side_inputs` output) stages
    inhomogeneous/t-dependent BC consts, array factors, AND
    space-and-time-dependent values (per-chunk step-indexed tables); with
    t or xt entries the window is ``window(data, key, t0, steps)``
    (attribute ``needs_t``) and ``dt`` is required.
    """
    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    has_t = bool(t_specs)
    needs_runtime = bool(has_t or xt_entries)
    if needs_runtime and dt is None:
        raise ValueError("dt is required for time-dependent BC windows")
    t_funcs = _t_slot_funcs(t_specs)
    xt_funcs = [spec.const_xt for _, spec in xt_entries]

    def make_t_tab(ts):
        if not t_funcs:
            return None
        return jnp.stack([jax.vmap(fn)(ts) for fn in t_funcs], axis=1)

    def make_xt_ops(ts):
        return [jax.vmap(fn)(ts) for fn in xt_funcs]

    if kernel_noise is not None:
        if interpret:
            raise PallasUnsupportedError(
                "In-kernel SDE noise has no interpret-mode lowering"
            )

        def build_kn(kk):
            step_kk, _ = make_fused_sde_kernel_noise_window_2d(
                grid, make_step, halo_per_step, dtype=dtype, k=kk,
                dist=kernel_noise["dist"], scale=kernel_noise["scale"],
                bc_inputs=bc_inputs,
            )
            return step_kk

        _, k = make_fused_sde_kernel_noise_window_2d(
            grid, make_step, halo_per_step, dtype=dtype,
            dist=kernel_noise["dist"], scale=kernel_noise["scale"],
            bc_inputs=bc_inputs,
        )
        kernels = _binary_kernel_ladder(build_kn, k)

        def window_kn(data, key, steps, t0=None):
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(key, (2,), jnp.uint32), jnp.int32
            )
            index = jnp.asarray(0, jnp.int32)
            remaining = steps
            for kk, step_fn in kernels:
                chunks = remaining // kk

                def body(c, carry, _kk=kk, _step=step_fn):
                    d, idx = carry
                    ctl = jnp.concatenate([seed, idx[None]])
                    if needs_runtime:
                        ts = t0 + (idx + jnp.arange(_kk)) * dt
                        return (
                            _step(d, ctl, make_xt_ops(ts), make_t_tab(ts)),
                            idx + _kk,
                        )
                    return (_step(d, ctl), idx + _kk)

                data, index = jax.lax.fori_loop(
                    0, chunks, body, (data, index)
                )
                remaining = remaining - chunks * kk
            return data

        if needs_runtime:

            def window_kn_t(data, key, t0, steps):
                return window_kn(data, key, steps, t0)

            window_kn_t.needs_t = True
            return window_kn_t
        return window_kn

    _, k = make_fused_sde_stencil_window_2d(
        grid, make_step, halo_per_step, dtype=dtype, interpret=interpret,
        bc_inputs=bc_inputs,
    )

    def build(kk):
        step_kk, _ = make_fused_sde_stencil_window_2d(
            grid, make_step, halo_per_step, dtype=dtype, k=kk,
            interpret=interpret, bc_inputs=bc_inputs,
        )
        return step_kk

    kernels = _binary_kernel_ladder(build, k)

    def window(data, key, steps, t0=None):
        index = jnp.asarray(0, jnp.int32)
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk

            def body(c, carry, _kk=kk, _step=step_fn):
                d, idx = carry
                noise = noise_fn(key, idx + jnp.arange(_kk))
                if needs_runtime:
                    ts = t0 + (idx + jnp.arange(_kk)) * dt
                    return (
                        _step(d, noise, make_xt_ops(ts), make_t_tab(ts)),
                        idx + _kk,
                    )
                return (_step(d, noise), idx + _kk)

            data, index = jax.lax.fori_loop(0, chunks, body, (data, index))
            remaining = remaining - chunks * kk
        return data

    if needs_runtime:

        def window_t(data, key, t0, steps):
            return window(data, key, steps, t0)

        window_t.needs_t = True
        return window_t
    return window


def _binary_kernel_ladder(build_step, k: int):
    """Build ``[(k, kernel), (k//2, kernel), ..., (1, kernel)]``.

    Decomposing a step count over this ladder costs O(log k) HBM passes for
    the remainder instead of one pass per leftover step. In interpret mode
    (CPU tests) only the k and 1 kernels are built — the intermediate levels
    exist purely to save HBM passes on real hardware, and tracing five
    kernels per window builder dominates test runtime.
    """
    if interpret_requested() and k > 1:
        return [(k, build_step(k)), (1, build_step(1))]
    kernels = []
    kk = k
    while kk >= 1:
        kernels.append((kk, build_step(kk)))
        kk //= 2
    return kernels


def _make_binary_chunked_window(build_step, k: int):
    """Return ``window(state, steps)`` decomposing steps over the binary
    kernel ladder (see :func:`_binary_kernel_ladder`)."""
    kernels = _binary_kernel_ladder(build_step, k)

    def window(state, steps):
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk
            state = jax.lax.fori_loop(0, chunks, lambda i, d: step_fn(d), state)
            remaining = remaining - chunks * kk
        return state

    return window


def make_chunked_multi_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, n_fields: int, *,
    dtype=np.float32, interpret: bool = False, bc_inputs=None, dt=None,
    stage_offsets=None,
) -> Callable:
    """Return ``window(datas, steps)`` chunking steps into k-step kernel calls.

    With time-dependent BC consts in ``bc_inputs`` the window instead has
    signature ``window(datas, t0, steps)`` (attribute ``needs_t``) and
    rebuilds the per-step SMEM const table from ``t0`` per chunk — ``dt`` is
    then required (ghost values at inner step s use ``t0 + s*dt``, matching
    the unfused stepper's t).

    ``stage_offsets`` (fractions of dt, e.g. ``(0.0, 0.5, 1.0)`` for RK4)
    sizes the tables for multi-stage steppers: inner step s's stage j reads
    ghost values at ``t0 + s*dt + stage_offsets[j]*dt``, and ``step(works)``
    selects the stage via ``helpers.bind_stage(j)``.
    """
    offsets = tuple(stage_offsets) if stage_offsets is not None else (0.0,)
    S = len(offsets)
    # probe the largest supported k, then build one kernel per power of two
    _, k = make_fused_multi_stencil_window_2d(
        grid, make_step, halo_per_step, n_fields, dtype=dtype,
        interpret=interpret, bc_inputs=bc_inputs, stages_per_step=S,
    )

    def build(kk):
        step, _ = make_fused_multi_stencil_window_2d(
            grid, make_step, halo_per_step, n_fields, dtype=dtype, k=kk,
            interpret=interpret, bc_inputs=bc_inputs, stages_per_step=S,
        )
        if step.t_specs is None and not step.xt_entries:
            return lambda d: tuple(step(list(d)))
        return lambda d, xt_ops, t_tab: tuple(step(list(d), xt_ops, t_tab))

    t_specs = [] if bc_inputs is None else list(bc_inputs["t"])
    xt_entries = [] if bc_inputs is None else list(bc_inputs.get("xt", []))
    if not t_specs and not xt_entries:
        window_t = _make_binary_chunked_window(build, k)

        def window(datas, steps):
            return list(window_t(tuple(datas), steps))

        return window

    if dt is None:
        raise ValueError("dt is required for time-dependent BC windows")
    kernels = _binary_kernel_ladder(build, k)
    t_funcs = _t_slot_funcs(t_specs)
    xt_funcs = [spec.const_xt for _, spec in xt_entries]

    def make_t_tab(ts):
        if not t_funcs:
            return None
        return jnp.stack([jax.vmap(fn)(ts) for fn in t_funcs], axis=1)

    stage_frac = jnp.asarray(offsets)

    def window_td(datas, t0, steps):
        state = tuple(datas)
        index = jnp.asarray(0, jnp.int32)
        remaining = steps
        for kk, step_fn in kernels:
            chunks = remaining // kk

            def body(c, carry, _kk=kk, _step=step_fn):
                d, idx = carry
                # (step, stage)-major rows: kernel stage j of inner step s
                # reads row s*S + j (S == 1: the plain per-step table)
                base = t0 + (idx + jnp.arange(_kk)) * dt
                ts = (base[:, None] + stage_frac[None, :] * dt).reshape(-1)
                xt_ops = [jax.vmap(fn)(ts) for fn in xt_funcs]
                return (_step(d, xt_ops, make_t_tab(ts)), idx + _kk)

            state, index = jax.lax.fori_loop(0, chunks, body, (state, index))
            remaining = remaining - chunks * kk
        return list(state)

    window_td.needs_t = True
    return window_td


def make_fused_stencil_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, *, dtype=np.float32,
    k: int | None = None, interpret: bool = False,
) -> tuple[Callable, int]:
    """Single-field convenience wrapper of the multi-field window kernel.

    `make_step(helpers)` must return ``step(work) -> work`` shrinking the
    row dimension by ``2*halo_per_step``. Returns (window_k(data), k).
    """

    def multi_make_step(helpers):
        step = make_step(helpers)
        return lambda works: [step(works[0])]

    window_multi, k = make_fused_multi_stencil_window_2d(
        grid, multi_make_step, halo_per_step, 1, dtype=dtype, k=k,
        interpret=interpret,
    )

    def window_k(data):
        return window_multi([data])[0]

    return window_k, k


def make_chunked_window_2d(
    grid: CartesianGrid, make_step, halo_per_step: int, *, dtype=np.float32,
    interpret: bool = False, bc_inputs=None, dt=None,
) -> Callable:
    """Return ``window(data, steps)`` chunking steps into k-step kernel calls.

    With t-dependent BC consts in ``bc_inputs`` the window has signature
    ``window(data, t0, steps)`` (attribute ``needs_t``) — see
    :func:`make_chunked_multi_window_2d`.
    """

    def multi_make_step(helpers):
        step = make_step(helpers)
        return lambda works: [step(works[0])]

    window_multi = make_chunked_multi_window_2d(
        grid, multi_make_step, halo_per_step, 1, dtype=dtype,
        interpret=interpret, bc_inputs=bc_inputs, dt=dt,
    )

    if getattr(window_multi, "needs_t", False):

        def window_td(data, t0, steps):
            return window_multi([data], t0, steps)[0]

        window_td.needs_t = True
        return window_td

    def window(data, steps):
        return window_multi([data], steps)[0]

    return window


def make_fused_euler_window_2d(
    grid: CartesianGrid, *, diffusivity: float, dt: float, dtype=np.float32,
    k: int = 2 * _HALO, bcs=None, interpret: bool = False,
) -> Callable:
    """Return ``window(data, steps) -> data`` advancing `steps` Euler diffusion
    steps with temporal blocking (k steps per HBM pass).

    Supports fully periodic grids and const-affine physical BCs via ``bcs``
    (the reference's no-flux benchmark case, `performance.rst:36-45`), and
    CylindricalSymGrid (the ``(1/r) d/dr`` term lowers as per-row in-kernel
    coefficients; the r axis always requires physical BCs).

    The configured 9-point corner-weight Laplacian lowers on fully periodic
    Cartesian grids (see :func:`make_affine_laplace_2d`); other
    configurations fall back to XLA.
    """
    from ..grids.cylindrical import CylindricalSymGrid

    is_cyl = isinstance(grid, CylindricalSymGrid)
    # cylindrical grids are exempt: the 2D-cartesian corner-weight config
    # does not alter their stencil (round-3 advisor finding)
    if (
        _corner_weight() != 0.0
        and not is_cyl
        and (
            bcs is not None
            or np.dtype(dtype) == np.dtype(jnp.bfloat16)
            or not all(grid.periodic)
        )
    ):
        raise PallasUnsupportedError(
            "The fused 9-point corner-weight window requires a fully "
            "periodic Cartesian grid with float32 data"
        )
    if is_cyl and bcs is None:
        raise PallasUnsupportedError("Cylindrical grids require explicit BCs")
    radial = (
        (float(grid.axes_bounds[0][0]), float(grid.discretization[0]))
        if is_cyl
        else None
    )
    if interpret:
        # relax the TPU-only preconditions (backend, tiling alignment,
        # dtype) but keep the band/halo geometry and BC-lowerability ones —
        # they are correctness constraints in interpret mode too
        def supports(kk):
            if grid.num_axes != 2 or not isinstance(
                grid, (CartesianGrid, CylindricalSymGrid)
            ):
                return False
            if _corner_weight() != 0.0 and not is_cyl and kk > _HALO:
                # 9-point k cap (see make_affine_laplace_2d)
                return False
            n_r, n_c = grid.shape
            if not _fused_geometry_ok(n_r, n_c, np.dtype(dtype).itemsize, kk):
                return False
            if bcs is not None:
                try:
                    if _specs_have_xt(affine_bc_specs(grid, bcs)):
                        return False
                except PallasUnsupportedError:
                    return False
            return True
    elif is_cyl:
        supports = lambda kk: supports_affine_laplace_cyl(grid, bcs, dtype, kk)
    elif bcs is None:
        supports = lambda kk: supports_affine_laplace(grid, dtype, kk)
    else:
        supports = lambda kk: supports_affine_laplace_bc(grid, bcs, dtype, kk)
    while k > 1 and not supports(k):
        k //= 2
    if not supports(k):
        raise PallasUnsupportedError("Unsupported configuration for fused window")

    def build(kk):
        return make_affine_laplace_2d(
            grid, a=1.0, b=dt * diffusivity, k=kk, dtype=dtype, bcs=bcs,
            interpret=interpret, radial=radial,
        )

    probe = build(1)
    if probe.t_slots is None:
        return _make_binary_chunked_window(build, k)

    # time-dependent BC values: each chunk recomputes its per-step SMEM
    # const table from the expression functions (the sharded XLA path does
    # the same per-step evaluation, `parallel/boundaries.py`); ghost values
    # at inner step s use t0 + s*dt, matching the unfused stepper's t
    t_funcs = probe.t_slots
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


def supports_affine_laplace_cyl(grid, bcs, dtype, k: int = 1) -> bool:
    """Preconditions of the fused cylindrical kernel (radial row term)."""
    from ..grids.cylindrical import CylindricalSymGrid

    if not isinstance(grid, CylindricalSymGrid):
        return False
    if bcs is None:  # the r axis is never periodic: explicit BCs required
        return False
    try:
        specs = affine_bc_specs(grid, bcs)
    except PallasUnsupportedError:
        return False
    if (
        _specs_have_xt(specs)
        or _specs_have_array_factors(specs)
        or _specs_have_t_factors(specs)
    ):
        return False
    cols_periodic = specs is None or (len(specs) > 1 and specs[1] is None)
    return _supports_fused_shape_2d(
        grid, dtype, k, grid_cls=object, allow_bf16=cols_periodic
    )


def make_fused_euler_window_cyl(
    grid, *, diffusivity: float, dt: float, bcs, dtype=np.float32,
    k: int = 2 * _HALO, interpret: bool = False,
) -> Callable:
    """Euler diffusion window on a CylindricalSymGrid (rows = r, lanes = z).

    Thin alias of :func:`make_fused_euler_window_2d`, which detects
    cylindrical grids itself; kept as an explicit named entry point."""
    from ..grids.cylindrical import CylindricalSymGrid

    if not isinstance(grid, CylindricalSymGrid):
        raise PallasUnsupportedError("CylindricalSymGrid required")
    return make_fused_euler_window_2d(
        grid, diffusivity=diffusivity, dt=dt, dtype=dtype, k=k, bcs=bcs,
        interpret=interpret,
    )


def supports_affine_laplace_ext_3d(
    local_shape, dtype, k: int = 1, *, ext_axes=(True, False, False),
    interpret: bool = False,
) -> bool:
    """Preconditions of the 3D halo-extended fused kernel on a local shard.

    ``ext_axes[ax]`` marks grid axes whose halo arrives via ppermute (the
    decomposed axes; x is always extended — it is the banded DMA axis).
    Non-extended y/z stay locally periodic via rolls and keep the TPU tiling
    alignment requirement; extended dims are zero-padded to the granule by
    the wrapper, so any size ≥ the halo works.
    """
    if len(local_shape) != 3 or not ext_axes[0]:
        return False
    nx, ny, nz = local_shape
    # nearest-neighbor exchange must be able to supply the whole halo
    if any(e and s < k for e, s in zip(ext_axes, local_shape, strict=True)):
        return False
    if interpret:
        return k >= 1
    if jax.default_backend() != "tpu":
        return False
    # f32 only: non-extended y/z axes use rolls (illegal for bf16)
    if np.dtype(dtype) != np.dtype(np.float32):
        return False
    if not ext_axes[1] and ny % 8 != 0:
        return False
    if not ext_axes[2] and nz % 128 != 0:
        return False
    ny_e = -(-(ny + 2 * k) // 8) * 8 if ext_axes[1] else ny
    nz_e = -(-(nz + 2 * k) // 128) * 128 if ext_axes[2] else nz
    band_k = _pick_band_k_3d((nx, ny_e, nz_e), np.dtype(dtype).itemsize)
    return band_k is not None and 1 <= k <= band_k[1]


def make_affine_laplace_ext_3d(
    local_shape, *, a: float = 0.0, b: float = 1.0, k: int = 1,
    discretization, ext_axes=(True, False, False), dtype=np.float32,
    bc_params=None, interpret: bool = False,
) -> Callable:
    """3D ``(ext, edge_flags) -> (a*I + b*lap)^k`` on a halo-extended block.

    The decomposed-3D analogue of :func:`make_affine_laplace_ext_2d` — the
    regime where multi-chip matters most (the reference runs its fastest 3D
    stencils under MPI unconditionally, `/root/reference/pde/backends/
    numba_mpi/backend.py:163-195`). ``ext`` carries ``k`` halo cells per side
    along every extended axis (x always; y/z when decomposed); non-extended
    y/z axes stay locally periodic via lane/sublane rolls. x halos cost only
    k planes (x is the untiled major dim — the round-2 insight); extended y/z
    dims are zero-padded to the (8, 128) tiling granule by the wrapper.

    ``edge_flags`` is an int32 ``(6,)`` array ``[x_lo, x_hi, y_lo, y_hi,
    z_lo, z_hi]`` marking GLOBAL domain edges; where set and ``bc_params``
    carries affine ghost parameters (:func:`affine_bc_params`), the kernel
    rewrites the ghost plane/row/lane each step instead of trusting the
    (garbage) halo. (No corner-weight gate: the
    ``laplacian_2d_corner_weight`` config only alters 2D stencils.)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not supports_affine_laplace_ext_3d(
        local_shape, dtype, k, ext_axes=ext_axes, interpret=interpret
    ):
        raise PallasUnsupportedError(
            "Halo-extended 3D fused laplace requires an aligned local block "
            "with float32/bfloat16 data on a TPU backend"
        )
    nx, ny, nz = local_shape
    ext_y, ext_z = ext_axes[1], ext_axes[2]
    # padded extents of the input (tiling granules on TPU; exact in interpret)
    ny_in = ny + 2 * k if ext_y else ny
    nz_in = nz + 2 * k if ext_z else nz
    ny_e = ny_in if interpret or not ext_y else -(-ny_in // 8) * 8
    nz_e = nz_in if interpret or not ext_z else -(-nz_in // 128) * 128
    if interpret:
        band = nx if nx <= 8 or nx % 8 else 8
        while nx % band:
            band //= 2
    else:
        band = _pick_band_k_3d((nx, ny_e, nz_e), np.dtype(dtype).itemsize)[0]
    n_programs = nx // band
    sx, sy, sz = (1.0 / np.asarray(discretization) ** 2).tolist()
    isotropic = sx == sy == sz
    bc_x = None if bc_params is None else bc_params[0]
    bc_y = None if bc_params is None else bc_params[1]
    bc_z = None if bc_params is None else bc_params[2]

    def kernel(flags_ref, f_hbm, out_ref, work_ref, sem):
        i = pl.program_id(0)
        row0 = i * band  # input planes [row0, row0 + band + 2*k)
        cp = pltpu.make_async_copy(
            f_hbm.at[pl.ds(pl.multiple_of(row0, band), band + 2 * k)],
            work_ref,
            sem,
        )
        cp.start()
        cp.wait()

        # true work region (strip the tiling pad on extended y/z)
        work = work_ref[:, :ny_in, :nz_in]

        def fix_axis(w, s, dim, bc, flag_lo, flag_hi, gate_lo=None, gate_hi=None):
            """Rewrite the ghost layer at the global edge along `dim`."""
            (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = bc

            def sl(idx, idx2=None):
                s_ = slice(idx, idx + 1) if idx2 is None else slice(idx, idx2)
                return tuple(
                    s_ if d == dim else slice(None) for d in range(3)
                )

            e_lo = k - s  # first globally valid index on the low-edge shard
            ghost_lo = c_lo + f1_lo * w[sl(e_lo)]
            if f2_lo:
                ghost_lo = ghost_lo + f2_lo * w[sl(e_lo + 1)]
            e_hi = w.shape[dim] - 1 - (k - s)
            ghost_hi = c_hi + f1_hi * w[sl(e_hi)]
            if f2_hi:
                ghost_hi = ghost_hi + f2_hi * w[sl(e_hi - 1)]
            idxs = jax.lax.broadcasted_iota(jnp.int32, w.shape, dim)
            lo = flags_ref[flag_lo] != 0
            hi = flags_ref[flag_hi] != 0
            if gate_lo is not None:
                lo = lo & gate_lo
            if gate_hi is not None:
                hi = hi & gate_hi
            w = jnp.where((idxs == e_lo - 1) & lo, ghost_lo, w)
            w = jnp.where((idxs == e_hi + 1) & hi, ghost_hi, w)
            return w

        for s in range(k):
            if bc_x is not None:
                work = fix_axis(
                    work, s, 0, bc_x, 0, 1,
                    gate_lo=i == 0, gate_hi=i == n_programs - 1,
                )
            if ext_y and bc_y is not None:
                work = fix_axis(work, s, 1, bc_y, 2, 3)
            if ext_z and bc_z is not None:
                work = fix_axis(work, s, 2, bc_z, 4, 5)
            sy_sl = slice(1, -1) if ext_y else slice(None)
            sz_sl = slice(1, -1) if ext_z else slice(None)
            center = work[1:-1, sy_sl, sz_sl]
            up = work[:-2, sy_sl, sz_sl]
            down = work[2:, sy_sl, sz_sl]
            cur_ny = center.shape[1]
            cur_nz = center.shape[2]
            if ext_y:
                north = work[1:-1, :-2, sz_sl]
                south = work[1:-1, 2:, sz_sl]
            else:
                north = pltpu.roll(center, 1, 1)
                south = pltpu.roll(center, cur_ny - 1, 1)
                if bc_y is not None:
                    (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = bc_y
                    ghost_lo = c_lo + f1_lo * center
                    if f2_lo:
                        ghost_lo = ghost_lo + f2_lo * south
                    ghost_hi = c_hi + f1_hi * center
                    if f2_hi:
                        ghost_hi = ghost_hi + f2_hi * north
                    ys = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
                    north = jnp.where(
                        (ys == 0) & (flags_ref[2] != 0), ghost_lo, north
                    )
                    south = jnp.where(
                        (ys == cur_ny - 1) & (flags_ref[3] != 0), ghost_hi, south
                    )
            if ext_z:
                west = work[1:-1, sy_sl, :-2]
                east = work[1:-1, sy_sl, 2:]
            else:
                west = pltpu.roll(center, 1, 2)
                east = pltpu.roll(center, cur_nz - 1, 2)
                if bc_z is not None:
                    (c_lo, f1_lo, f2_lo), (c_hi, f1_hi, f2_hi) = bc_z
                    ghost_lo = c_lo + f1_lo * center
                    if f2_lo:
                        ghost_lo = ghost_lo + f2_lo * east
                    ghost_hi = c_hi + f1_hi * center
                    if f2_hi:
                        ghost_hi = ghost_hi + f2_hi * west
                    zs = jax.lax.broadcasted_iota(jnp.int32, center.shape, 2)
                    west = jnp.where(
                        (zs == 0) & (flags_ref[4] != 0), ghost_lo, west
                    )
                    east = jnp.where(
                        (zs == cur_nz - 1) & (flags_ref[5] != 0), ghost_hi, east
                    )
            if isotropic:
                lap6 = up + down + north + south + west + east - 6.0 * center
                work = a * center + (b * sx) * lap6
            else:
                lap = (
                    (up + down - 2.0 * center) * sx
                    + (north + south - 2.0 * center) * sy
                    + (west + east - 2.0 * center) * sz
                )
                work = a * center + b * lap
        out_ref[:, :, :] = work

    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        grid=(nx // band,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (band, ny, nz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band + 2 * k, ny_e, nz_e), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    pad_y = ny_e - ny_in
    pad_z = nz_e - nz_in
    no_edges = jnp.zeros((6,), jnp.int32)

    def affine_laplace_ext(ext, edge_flags=None):
        ext = jnp.asarray(ext, dtype=dtype)
        if pad_y or pad_z:
            ext = jnp.pad(ext, ((0, 0), (0, pad_y), (0, pad_z)))
        flags = no_edges if edge_flags is None else jnp.asarray(
            edge_flags, jnp.int32
        )
        return call(flags, ext)

    return affine_laplace_ext


# -- halo-extended kernels for decomposed (shard_map) execution -----------------------
#
# On a decomposed grid each shard holds a local (n, m) block; the temporal-
# blocking trick needs k rows/columns of neighbor data per kernel call. The
# shard_map driver (pde_tpu.parallel.fused) exchanges width-`halo` halos via
# paired `lax.ppermute` once per k-step call — the TPU analogue of the
# reference's halos-inside-the-compiled-loop (`/root/reference/pde/backends/
# numba_mpi/backend.py:163-195`) — and hands this kernel the extended array.
# The halo width is 8 rows on TPU (the DMA sublane granule) regardless of k;
# the kernel value-slices the (band + 2k)-row work region out of the loaded
# block. Columns are either locally periodic (lane rolls; used when the column
# axis is not decomposed) or halo-extended too, in which case the wrapper
# zero-pads the lane dimension to a multiple of 128 so every DMA stays
# tiling-aligned (Mosaic rejects lane-unaligned memref slices).


def ext_halo_width(k: int, *, interpret: bool = False) -> int:
    """Halo width of the extended input array for a k-step kernel."""
    return k if interpret else _HALO


def supports_affine_laplace_ext(
    local_shape, dtype, k: int = 1, *, ext_cols: bool = True,
    interpret: bool = False,
) -> bool:
    """Preconditions of the halo-extended fused kernel on a local shard."""
    if len(local_shape) != 2:
        return False
    n_rows, n_cols = local_shape
    halo = ext_halo_width(k, interpret=interpret)
    # nearest-neighbor exchange must be able to supply the whole halo
    if n_rows < halo or (ext_cols and n_cols < halo):
        return False
    if interpret:
        return k >= 1
    if jax.default_backend() != "tpu":
        return False
    if n_rows % 8 != 0 or n_cols % 128 != 0:
        return False
    ok_dtypes = [np.dtype(np.float32)]
    if ext_cols:  # extended columns use shifted slices, not rolls
        ok_dtypes.append(np.dtype(jnp.bfloat16))
    if np.dtype(dtype) not in ok_dtypes:
        return False
    return 1 <= k <= _HALO


def _pick_band_ext(n_rows: int, n_cols_ext: int, itemsize: int, halo: int) -> int:
    """Output-row band size dividing n_rows; input block is (band + 2*halo) rows.

    Same VMEM footprint model as :func:`_pick_band` with the halo-extended
    input block in place of the band + DMA-halo buffers."""

    def footprint(band):
        rows = (band + 2 * halo) + 2 * band + 3 * (band + 2 * halo)
        return rows * n_cols_ext * itemsize

    forced = os.environ.get("PDE_TPU_FORCE_BAND")
    if forced and n_rows % int(forced) == 0:
        return int(forced)
    budget = _vmem_budget()
    for candidate in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if footprint(candidate) <= budget and n_rows % candidate == 0:
            return candidate
    return n_rows


def make_affine_laplace_ext_2d(
    local_shape, *, a: float = 0.0, b: float = 1.0, k: int = 1,
    discretization, ext_cols: bool = True, dtype=np.float32,
    bc_params=None, bc_specs=None, interpret: bool = False, radial=None,
) -> Callable:
    """Return ``(ext, edge_flags) -> (a*I + b*lap)^k`` on a halo-extended block.

    With ``halo = ext_halo_width(k)``, ``ext`` has shape
    ``(n + 2*halo, m + 2*halo)`` when ``ext_cols`` else ``(n + 2*halo, m)``,
    where ``(n, m) = local_shape``; the result has shape ``(n, m)``. Boundary
    data comes from the halos (``ext_cols=False`` keeps columns locally
    periodic via lane rolls — valid only when the column axis is periodic and
    not decomposed). The caller fills the halos, so the same kernel serves
    shard-internal edges and wrapped periodic edges.

    ``edge_flags`` is an int32 ``(5,)`` array ``[row_lo, row_hi, col_lo,
    col_hi, row_offset]`` marking whether this shard sits at the
    corresponding GLOBAL domain edge; where a flag is set and ``bc_params``
    carries affine ghost parameters for that axis, the kernel rewrites the
    ghost row/column each step instead of trusting the (garbage) halo — the
    decomposed analogue of the single-device BC fixups. A ``(4,)`` array is
    accepted too (row_offset 0).

    ``bc_specs`` generalizes ``bc_params`` to :class:`_BCSideSpec` pairs
    (the output of :func:`affine_bc_specs`): inhomogeneous per-boundary-point
    const arrays and time-dependent expression values lower as runtime side
    inputs, mirroring :func:`make_affine_laplace_2d`. For array-valued slots
    the spec's values are ignored — the caller supplies LOCAL slices at call
    time (sharded callers slice host-precomputed GLOBAL arrays by
    ``lax.axis_index``, per the bit-identity rule). The returned callable
    then has signature ``step(ext, edge_flags, *arrays)`` with one extra
    operand per entry of ``step.array_slots`` (slot order 0=row_lo, 1=row_hi,
    2=col_lo, 3=col_hi; row-side arrays shaped ``(1, cols_ext)``, column-side
    arrays ``(n + 2*halo,)``), plus a trailing ``(k, 4)`` t-table when
    ``step.has_t``.

    ``radial=(r_lo, dr_r)`` adds the cylindrical ``(1/r) d/dr`` row term as
    in :func:`make_affine_laplace_2d`; the GLOBAL row index is
    ``row_offset + local row``, where the caller supplies ``row_offset =
    shard_index * local_rows`` via the flags array.
    """
    corner_w = 0.0
    if radial is None:
        # the configured 9-point corner-weight stencil lowers here under
        # the SAME gate as the serial kernel (fully periodic + f32): the
        # halo exchange already carries corner data (temporal blocking
        # needs it for the 5-point form too), so decomposed runs stay
        # bit-identical to the serial fused kernel (round-4 advisor
        # finding closed; formerly a documented asymmetry — the ext kernel
        # refused and decomposed runs fell back to sharded XLA). Other
        # corner-weight configs (physical BCs need the corner-ghost
        # extrapolation; bf16) refuse like the serial kernel. Cylindrical
        # grids are exempt: the 2D-cartesian config key does not alter
        # their stencil (round-3 advisor finding).
        corner_w = _corner_weight()
        if corner_w != 0.0 and (
            bc_specs is not None
            or np.dtype(dtype) == np.dtype(jnp.bfloat16)
        ):
            raise PallasUnsupportedError(
                "The fused 9-point corner-weight stencil requires a fully "
                "periodic grid with float32 data "
                "(laplacian_2d_corner_weight != 0 falls back to XLA)"
            )
        if corner_w != 0.0 and ext_cols:
            # column-cut decompositions read column neighbors as SLICES of
            # the halo-extended block while the serial kernel uses lane
            # rolls — XLA:CPU rounds the two (mathematically identical)
            # graphs differently on rare cells (1 ulp, measured round 5),
            # which would break the sharded-vs-serial bit-identity
            # invariant. Row-cut decompositions keep the roll-based column
            # graph and lower below; column cuts take the XLA fallback.
            raise PallasUnsupportedError(
                "The fused 9-point corner-weight stencil supports row-cut "
                "decompositions only (column cuts fall back to XLA)"
            )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if _specs_have_array_factors(bc_specs):
        raise PallasUnsupportedError(
            "Array-valued BC factors are not supported by the halo-extended "
            "affine kernel"
        )
    if not supports_affine_laplace_ext(local_shape, dtype, k, ext_cols=ext_cols,
                                       interpret=interpret):
        raise PallasUnsupportedError(
            "Halo-extended fused laplace requires an aligned 2D local block "
            "with float32/bfloat16 data on a TPU backend"
        )
    n_rows, n_cols = local_shape
    halo = ext_halo_width(k, interpret=interpret)
    itemsize = np.dtype(dtype).itemsize
    # lane dimension of the padded input (multiple of 128 on TPU)
    cols_ext = n_cols + 2 * halo if ext_cols else n_cols
    lanes = cols_ext if interpret else -(-cols_ext // 128) * 128
    band = _pick_band_ext(n_rows, lanes, itemsize, halo)
    n_programs = n_rows // band
    sx, sy = (1.0 / np.asarray(discretization) ** 2).tolist()
    isotropic = sx == sy
    if bc_specs is None and bc_params is not None:
        bc_specs = tuple(
            None
            if axis is None
            else tuple(_BCSideSpec(f1, f2, c) for (c, f1, f2) in axis)
            for axis in bc_params
        )
    if _specs_have_xt(bc_specs):
        raise PallasUnsupportedError(
            "Space-and-time-dependent BC values are not supported by the "
            "affine ext kernel (the expression-compiled windows lower them)"
        )
    bc_rows = None if bc_specs is None else bc_specs[0]
    bc_cols = None if bc_specs is None else bc_specs[1]

    # runtime side inputs for inhomogeneous / time-dependent consts
    # (slots: 0 = row low, 1 = row high, 2 = col low, 3 = col high)
    array_slots: list[int] = []
    t_slots: list = [None, None, None, None]
    for slot, spec in enumerate(
        (list(bc_rows) if bc_rows else [None, None])
        + (list(bc_cols) if bc_cols else [None, None])
    ):
        if spec is None:
            continue
        if np.ndim(spec.const_static) != 0:
            array_slots.append(slot)
        if spec.const_t is not None:
            t_slots[slot] = spec.const_t
    has_t = any(f is not None for f in t_slots)
    row_slots = [s for s in array_slots if s < 2]
    col_slots = [s for s in array_slots if s >= 2]
    n_row_in = len(row_slots)
    n_col_in = len(col_slots)
    row_slot_pos = {s: j for j, s in enumerate(row_slots)}
    col_slot_pos = {s: j for j, s in enumerate(col_slots)}

    def kernel(*refs):
        flags_ref = refs[0]
        pos = 1
        if has_t:
            t_tab = refs[pos]
            pos += 1
        row_refs = refs[pos : pos + n_row_in]
        pos += n_row_in
        col_hbm = refs[pos : pos + n_col_in]
        pos += n_col_in
        f_hbm = refs[pos]
        out_ref = refs[pos + 1]
        work_ref = refs[pos + 2]
        col_vmem = refs[pos + 3 : pos + 3 + n_col_in]
        sem = refs[pos + 3 + n_col_in]

        i = pl.program_id(0)
        row0 = i * band  # input rows [row0, row0 + band + 2*halo)
        cp = pltpu.make_async_copy(
            f_hbm.at[pl.ds(pl.multiple_of(row0, band), band + 2 * halo), :],
            work_ref,
            sem.at[0] if n_col_in else sem,
        )
        cp.start()
        copies = [cp]
        for j in range(n_col_in):
            # column-BC value-vector rows matching this program's block
            ccp = pltpu.make_async_copy(
                col_hbm[j].at[
                    pl.ds(pl.multiple_of(row0, band), band + 2 * halo), :
                ],
                col_vmem[j],
                sem.at[1 + j],
            )
            ccp.start()
            copies.append(ccp)
        for ccp in copies:
            ccp.wait()

        def const_for(slot, s, col_rows=None):
            """Additive ghost const for `slot` at step `s` (scalar or array)."""
            spec = (bc_rows if slot < 2 else bc_cols)[slot % 2]
            if np.ndim(spec.const_static) == 0:
                c = spec.const_static
            elif slot < 2:
                # row-side array: columns matching the current work width
                if ext_cols:
                    c = row_refs[row_slot_pos[slot]][
                        0:1, halo - k + s : halo + k + n_cols - s
                    ]
                else:
                    c = row_refs[row_slot_pos[slot]][0:1, :n_cols]
            else:
                c = col_vmem[col_slot_pos[slot]][col_rows][:, 0:1]
            if t_slots[slot] is not None:
                c = c + t_tab[s, slot]
            return c

        if radial is not None:
            # per-row cylindrical coefficients over the work-region rows
            # [row0-k, row0+band+k) at GLOBAL index flags[4] + local row
            cu_full, cd_full, c_center = _radial_row_coeffs(
                radial, a, b, sx, sy, dtype,
                flags_ref[4] + row0 - np.int32(k), band + 2 * k,
            )

        def update(up, down, left, right, center, s):
            if radial is not None:
                sl = slice(s + 1, band + 2 * k - s - 1)
                return (
                    cu_full[sl] * up
                    + cd_full[sl] * down
                    + (b * sy) * (left + right)
                    + c_center * center
                )
            if isotropic:
                lap4 = up + down + left + right - 4.0 * center
                return a * center + (b * sx) * lap4
            lap = (up + down - 2.0 * center) * sx + (
                left + right - 2.0 * center
            ) * sy
            return a * center + b * lap

        def fix_rows(work, s):
            if bc_rows is None:
                return work
            lo, hi = bc_rows
            e_lo = k - s  # first globally valid row on the low-edge shard
            ghost_lo = const_for(0, s) + lo.f1 * work[e_lo : e_lo + 1, :]
            if lo.f2:
                ghost_lo = ghost_lo + lo.f2 * work[e_lo + 1 : e_lo + 2, :]
            h = work.shape[0]
            e_hi = h - 1 - (k - s)
            ghost_hi = const_for(1, s) + hi.f1 * work[e_hi : e_hi + 1, :]
            if hi.f2:
                ghost_hi = ghost_hi + hi.f2 * work[e_hi - 1 : e_hi, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, work.shape, 0)
            lo_edge = (flags_ref[0] != 0) & (i == 0)
            hi_edge = (flags_ref[1] != 0) & (i == n_programs - 1)
            work = jnp.where((rows == e_lo - 1) & lo_edge, ghost_lo, work)
            work = jnp.where((rows == e_hi + 1) & hi_edge, ghost_hi, work)
            return work

        if ext_cols:
            work = work_ref[
                halo - k : halo + k + band, halo - k : halo + k + n_cols
            ]
            for s in range(k):
                if corner_w != 0.0:
                    # 9-point corner-weight stencil, term-for-term the
                    # serial lowering's arithmetic (bit-identity; see the
                    # k-cap note in make_affine_laplace_2d): the diagonals
                    # are row-slices of the column-extended block
                    dm2 = sx + sy
                    center = work[1:-1, 1:-1]
                    lap9 = (
                        ((1.0 - corner_w) * sx)
                        * (work[:-2, 1:-1] + work[2:, 1:-1])
                        + ((1.0 - corner_w) * sy)
                        * (work[1:-1, :-2] + work[1:-1, 2:])
                        + (0.25 * corner_w * dm2)
                        * (
                            work[:-2, :-2]
                            + work[2:, :-2]
                            + work[:-2, 2:]
                            + work[2:, 2:]
                        )
                        + ((corner_w - 2.0) * dm2) * center
                    )
                    work = a * center + b * lap9
                    continue
                work = fix_rows(work, s)
                if bc_cols is not None:
                    lo, hi = bc_cols
                    # work rows span block rows [halo-k+s, halo+k+band-s)
                    col_rows = slice(halo - k + s, halo + k + band - s)
                    e_lo = k - s
                    g_lo = const_for(2, s, col_rows) + lo.f1 * work[
                        :, e_lo : e_lo + 1
                    ]
                    if lo.f2:
                        g_lo = g_lo + lo.f2 * work[:, e_lo + 1 : e_lo + 2]
                    w = work.shape[1]
                    e_hi = w - 1 - (k - s)
                    g_hi = const_for(3, s, col_rows) + hi.f1 * work[
                        :, e_hi : e_hi + 1
                    ]
                    if hi.f2:
                        g_hi = g_hi + hi.f2 * work[:, e_hi - 1 : e_hi]
                    cols = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
                    work = jnp.where(
                        (cols == e_lo - 1) & (flags_ref[2] != 0), g_lo, work
                    )
                    work = jnp.where(
                        (cols == e_hi + 1) & (flags_ref[3] != 0), g_hi, work
                    )
                up = work[:-2, 1:-1]
                down = work[2:, 1:-1]
                center = work[1:-1, 1:-1]
                left = work[1:-1, :-2]
                right = work[1:-1, 2:]
                work = update(up, down, left, right, center, s)
        else:
            work = work_ref[halo - k : halo + k + band, :]
            for s in range(k):
                if corner_w != 0.0:
                    # 9-point stencil with locally periodic columns: the
                    # exact serial lowering (diagonals as row-slices of the
                    # same two lane rolls; see the k-cap note in
                    # make_affine_laplace_2d)
                    lroll = pltpu.roll(work, 1, 1)
                    rroll = pltpu.roll(work, n_cols - 1, 1)
                    center = work[1:-1, :]
                    dm2 = sx + sy
                    lap9 = (
                        ((1.0 - corner_w) * sx) * (work[:-2, :] + work[2:, :])
                        + ((1.0 - corner_w) * sy)
                        * (lroll[1:-1, :] + rroll[1:-1, :])
                        + (0.25 * corner_w * dm2)
                        * (
                            lroll[:-2, :]
                            + lroll[2:, :]
                            + rroll[:-2, :]
                            + rroll[2:, :]
                        )
                        + ((corner_w - 2.0) * dm2) * center
                    )
                    work = a * center + b * lap9
                    continue
                work = fix_rows(work, s)
                up = work[:-2, :]
                center = work[1:-1, :]
                down = work[2:, :]
                left = pltpu.roll(center, 1, 1)
                right = pltpu.roll(center, n_cols - 1, 1)
                if bc_cols is not None:
                    lo, hi = bc_cols
                    # center rows span block rows [halo-k+s+1, halo+k+band-s-1)
                    col_rows = slice(halo - k + s + 1, halo + k + band - s - 1)
                    g_lo = const_for(2, s, col_rows) + lo.f1 * center
                    if lo.f2:
                        g_lo = g_lo + lo.f2 * right
                    g_hi = const_for(3, s, col_rows) + hi.f1 * center
                    if hi.f2:
                        g_hi = g_hi + hi.f2 * left
                    lanes_i = jax.lax.broadcasted_iota(
                        jnp.int32, center.shape, 1
                    )
                    left = jnp.where(
                        (lanes_i == 0) & (flags_ref[2] != 0), g_lo, left
                    )
                    right = jnp.where(
                        (lanes_i == n_cols - 1) & (flags_ref[3] != 0),
                        g_hi,
                        right,
                    )
                work = update(up, down, left, right, center, s)
        out_ref[:, :] = work

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if has_t else [])
        + [
            pl.BlockSpec(
                (1, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ] * n_row_in
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_col_in
        + [pl.BlockSpec(memory_space=pl.ANY)]
    )
    call = _pallas_call(
        pl, pltpu,
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        grid=(n_rows // band,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (band, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((band + 2 * halo, lanes), dtype),
        ]
        + [pltpu.VMEM((band + 2 * halo, 128), dtype)] * n_col_in
        + [
            pltpu.SemaphoreType.DMA((1 + n_col_in,))
            if n_col_in
            else pltpu.SemaphoreType.DMA
        ],
        interpret=interpret,
    )

    pad_lanes = lanes - cols_ext
    no_edges = jnp.zeros((5,), jnp.int32)

    def affine_laplace_ext(ext, edge_flags=None, *extra):
        """``extra``: one LOCAL array per entry of ``array_slots`` (row-side
        ``(1, cols_ext)``, column-side ``(n + 2*halo,)``), then the ``(k, 4)``
        t-table when ``has_t``."""
        ext = jnp.asarray(ext, dtype=dtype)
        if pad_lanes:
            ext = jnp.pad(ext, ((0, 0), (0, pad_lanes)))
        if edge_flags is None:
            flags = no_edges
        else:
            flags = jnp.asarray(edge_flags, jnp.int32)
            if flags.shape[0] == 4:  # no row offset supplied
                flags = jnp.concatenate([flags, jnp.zeros((1,), jnp.int32)])
        n_arr = len(array_slots)
        arrays = list(extra[:n_arr])
        t_args = []
        if has_t:
            t_args = [jnp.asarray(extra[n_arr], dtype=dtype)]
        row_ops, col_ops = [], []
        for slot, arr in zip(array_slots, arrays, strict=True):
            arr = jnp.asarray(arr, dtype=dtype)
            if slot < 2:
                arr = arr.reshape(1, -1)
                if arr.shape[1] < lanes:
                    arr = jnp.pad(arr, ((0, 0), (0, lanes - arr.shape[1])))
                row_ops.append(arr)
            else:
                # broadcast across one 128-lane tile: Mosaic rejects width-1
                # memref slices, the kernel value-slices lane 0
                col_ops.append(
                    jnp.broadcast_to(arr.reshape(-1, 1), (arr.shape[0], 128))
                )
        return call(flags, *t_args, *row_ops, *col_ops, ext)

    affine_laplace_ext.array_slots = tuple(array_slots)
    affine_laplace_ext.has_t = has_t
    affine_laplace_ext.t_slots = tuple(t_slots) if has_t else None
    affine_laplace_ext.halo = halo
    return affine_laplace_ext
