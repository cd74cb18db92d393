"""Base classes for PDEs (deterministic and stochastic).

TPU-native re-design of `/root/reference/pde/pdes/base.py:57,568`. PDE objects
describe the evolution rate on the *field* level (pure functions of pytree
fields, traceable under jit); ``make_pde_rhs`` lowers this to a function on raw
data leaves for the compiled solver loops. The entire time loop runs on device
(`lax.fori_loop`/`while_loop`), unlike the reference's per-step Python loop
(`backends/jax/_solvers.py:79-94`).
"""

from __future__ import annotations

import copy
import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.base import FieldBase
from ..fields.collection import FieldCollection
from ..fields.datafield_base import DataFieldBase

NOISE_INTERPRETATIONS: dict[str, float] = {
    "ito": 0.0,
    "itô": 0.0,
    "stratonovich": 0.5,
    "anti-ito": 1.0,
    "anti-itô": 1.0,
    "hänggi-klimontovich": 1.0,
    "hanggi-klimontovich": 1.0,
}


def make_increment_draw() -> Callable:
    """Return ``draw(key, shape, dtype) -> array`` for SDE noise increments.

    Selected by the config key ``sde.increment_dist``.  Euler-Maruyama
    converges WEAKLY (order 1) for any increment law matching the Gaussian's
    first three moments (Kloeden & Platen, weak Taylor schemes) — Gaussianity
    is not required — so cheaper moment-matched laws are admissible when only
    distributional statistics matter:

    - ``"normal"`` (default): exact N(0,1) — required for strong/pathwise
      convergence; the only law the reference offers
      (`/root/reference/pde/backends/jax/backend.py:866`).
    - ``"irwin4"``: ``(sum of 4 uniforms - 2) * sqrt(3)`` — exact first three
      moments, excess kurtosis -0.3; measured 2.1x the Box-Muller generation
      rate on the TPU VPU (docs/BENCHMARKS.md round-3 experiments).
    - ``"rademacher"``: two-point law ±1 — the minimal weak-order-1
      increment (matches E x, E x², E x³).

    Complex dtypes draw independent real/imaginary parts at half variance,
    matching ``jax.random.normal``'s complex convention.
    """
    from ..utils.config import config

    dist = str(config["sde.increment_dist"])

    if dist == "normal":
        return jax.random.normal

    if dist == "irwin4":

        def draw_real(key, shape, dtype):
            u = jax.random.uniform(key, (4, *shape), dtype=dtype)
            return (jnp.sum(u, axis=0) - 2.0) * np.sqrt(3.0).astype(dtype)

    elif dist == "rademacher":

        def draw_real(key, shape, dtype):
            return jax.random.rademacher(key, shape, dtype=dtype)

    else:
        raise ValueError(
            f"Unknown sde.increment_dist {dist!r} "
            "(expected 'normal', 'irwin4', or 'rademacher')"
        )

    def draw(key, shape, dtype=float):
        dtype = jnp.dtype(dtype)
        if jnp.issubdtype(dtype, jnp.complexfloating):
            real_dtype = jnp.finfo(dtype).dtype
            k_re, k_im = jax.random.split(key)
            scale = np.sqrt(0.5).astype(real_dtype)
            return (
                scale * draw_real(k_re, shape, real_dtype)
                + 1j * scale * draw_real(k_im, shape, real_dtype)
            ).astype(dtype)
        return draw_real(key, tuple(shape), dtype)

    return draw


def state_leaves(state: FieldBase) -> list:
    """Extract the raw data leaves of a field pytree."""
    return [jnp.asarray(x) for x in jax.tree_util.tree_leaves(state)]


def state_from_leaves(template: FieldBase, leaves) -> FieldBase:
    """Rebuild a field object from raw data leaves using a template."""
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, list(leaves))


class PDEBase:
    """Abstract base class for partial differential equations."""

    explicit_time_dependence: bool | None = None
    complex_valued: bool = False
    use_noise_variance: bool = False
    use_noise_realization: bool = False

    def __init__(self, *, rng: np.random.Generator | None = None):
        self._logger = logging.getLogger(self.__class__.__name__)
        self.rng = np.random.default_rng(rng)
        self.diagnostics: dict[str, Any] = {}

    @property
    def is_sde(self) -> bool:
        noise = getattr(self, "noise", 0)
        has_noise = not np.allclose(np.asarray(noise, dtype=float), 0, atol=1e-14)
        return (self.use_noise_variance and has_noise) or self.use_noise_realization

    @property
    def _noise_drift_factor(self) -> float:
        interpretation = getattr(self, "noise_interpretation", "ito")
        return NOISE_INTERPRETATIONS[interpretation]

    # -- interface to implement ----------------------------------------------------------
    def evolution_rate(self, state: FieldBase, t: float = 0) -> FieldBase:
        """Evaluate the right hand side of the PDE (pure, traceable)."""
        raise NotImplementedError

    def make_post_step_hook(self, state: FieldBase):
        """Return (hook, initial_data) where hook(leaves, t, data) -> (leaves, data).

        Raising NotImplementedError (the default) signals that no hook exists.
        """
        raise NotImplementedError

    def _fused_rhs(self) -> tuple[str, Any]:
        """Return ``(rhs expression string, bc)`` for the expression-routed
        fused windows/spectral splits, or raise NotImplementedError when the
        model has no single-expression form (the default)."""
        raise NotImplementedError(
            f"{self.__class__.__name__} has no expression form for fused windows"
        )

    def make_fused_rk4_window(self, state: FieldBase, dt: float, mesh=None):
        """Fused Pallas fixed-dt RK4 window via the expression stencil
        lowering (see :meth:`pde_tpu.models.pde.PDE.make_fused_rk4_window`).

        Available on every model defining :meth:`_fused_rhs`; raises
        NotImplementedError otherwise (solvers then use the XLA window).
        """
        from .pde import PDE

        if self.is_sde:
            raise NotImplementedError(
                "Deterministic RK4 windows do not support noise"
            )
        rhs, bc = self._fused_rhs()
        eq = PDE({"c": rhs}, bc=bc)
        return eq.make_fused_rk4_window(state, dt, mesh=mesh)

    def make_fused_ab2_window(self, state: FieldBase, dt: float, mesh=None):
        """Fused Pallas fixed-dt Adams-Bashforth window via the expression
        stencil lowering (see
        :meth:`pde_tpu.models.pde.PDE.make_fused_ab2_window`)."""
        from .pde import PDE

        if self.is_sde:
            raise NotImplementedError(
                "Adams-Bashforth windows do not support noise"
            )
        rhs, bc = self._fused_rhs()
        eq = PDE({"c": rhs}, bc=bc)
        return eq.make_fused_ab2_window(state, dt, mesh=mesh)

    # -- lowering to raw-data functions ----------------------------------------------------
    def make_pde_rhs(self, state: FieldBase, backend: str = "jax") -> Callable:
        """Return ``rhs(leaves, t) -> leaves`` operating on raw data arrays.

        Reference: `pdes/base.py:402`. There is a single backend (XLA); the
        `backend` argument is accepted for API compatibility.
        """
        template = state.copy()

        def rhs(leaves, t):
            field = state_from_leaves(template, leaves)
            rate = self.evolution_rate(field, t)
            return [jnp.asarray(x) for x in jax.tree_util.tree_leaves(rate)]

        return rhs

    def make_evolution_rate(self, state: FieldBase, backend: str = "jax") -> Callable:
        """Alias of :meth:`make_pde_rhs` (reference `pdes/base.py:429`)."""
        return self.make_pde_rhs(state, backend)

    def check_rhs_consistency(self, state: FieldBase, t: float = 0, *, tol: float = 1e-7):
        """Check that the lowered rhs matches the field-level evolution rate."""
        rhs = self.make_pde_rhs(state)
        leaves = state_leaves(state)
        res_data = rhs(leaves, t)
        expected = state_leaves(self.evolution_rate(state, t))
        for a, b in zip(res_data, expected, strict=True):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=tol, atol=tol,
                err_msg="make_pde_rhs inconsistent with evolution_rate",
            )

    # -- simulation entry point ---------------------------------------------------------------
    def solve(
        self,
        state: FieldBase,
        t_range,
        dt: float | None = None,
        tracker="auto",
        *,
        backend: str = "auto",
        solver="euler",
        ret_info: bool = False,
        **kwargs,
    ):
        """Solve the PDE: construct solver + controller and run the time loop.

        Mirrors `pdes/base.py:451`.
        """
        from ..solvers import Controller
        from ..solvers.base import SolverBase

        gather_mode = kwargs.pop("gather_mode", "all")
        if callable(solver) and not isinstance(solver, (str, SolverBase)):
            solver_obj = solver(pde=self, backend=backend, **kwargs)
        elif isinstance(solver, str):
            if solver in {"euler", "explicit", "explicit_mpi", "explicit_sharded", "runge-kutta"}:
                kwargs.setdefault("adaptive", dt is None)
            solver_obj = SolverBase.from_name(solver, pde=self, backend=backend, **kwargs)
        elif isinstance(solver, SolverBase):
            raise TypeError("`solver` must be a class or name, not an instance")
        else:
            raise TypeError(f"Solver {solver} is not supported")

        controller = Controller(
            solver_obj, t_range=t_range, tracker=tracker, gather_mode=gather_mode
        )
        try:
            final_state = controller.run(state, dt)
        finally:
            self.diagnostics.update(controller.diagnostics)
        if ret_info:
            return final_state, copy.deepcopy(self.diagnostics)
        return final_state


class SDEBase(PDEBase):
    """Base class for stochastic differential equations with additive/multiplicative
    Gaussian white noise.

    Reference: `pdes/base.py:568`.
    """

    use_noise_variance: bool = True
    use_noise_realization: bool = False

    def __init__(self, *, noise=0, noise_interpretation: str = "ito",
                 rng: np.random.Generator | None = None):
        super().__init__(rng=rng)
        self.noise = np.asanyarray(noise)
        if noise_interpretation not in NOISE_INTERPRETATIONS:
            raise ValueError(
                f"Unknown noise interpretation `{noise_interpretation}`; "
                f"options: {sorted(set(NOISE_INTERPRETATIONS))}"
            )
        self.noise_interpretation = noise_interpretation

    def make_noise_variance(self, state: FieldBase, *, ret_diff: bool = False) -> Callable:
        """Return ``noise_var(leaves, t) -> list of variances`` (per leaf).

        With ``ret_diff=True`` the function returns (variances, derivatives);
        the default additive noise has zero derivative.
        Reference: `pdes/base.py:634`.
        """
        if isinstance(state, FieldCollection):
            noise_arr = np.broadcast_to(self.noise, (len(state),))
            variances = [
                jnp.asarray(np.broadcast_to(float(var), f.data.shape))
                for var, f in zip(noise_arr, state.fields, strict=True)
            ]
        else:
            if self.noise.ndim > 0 and isinstance(state, DataFieldBase) and state.rank > 0:
                variances = [
                    jnp.asarray(
                        np.broadcast_to(
                            self.noise.reshape(self.noise.shape + (1,) * state.grid.num_axes),
                            state.data.shape,
                        )
                    )
                ]
            else:
                variances = [jnp.asarray(np.broadcast_to(self.noise, state.data.shape))]

        if ret_diff:
            zeros = [jnp.zeros_like(v) for v in variances]

            def noise_var_diff(leaves, t):
                return variances, zeros

            return noise_var_diff

        def noise_var(leaves, t):
            return variances

        return noise_var

    def make_noise_realization(self, state: FieldBase, backend: str = "jax") -> Callable:
        """Return ``noise(leaves, t, key) -> leaves`` for custom noise structures.

        Only used when ``use_noise_realization`` is set by a subclass.
        """
        raise NotImplementedError

    def make_sde_noise_step(self, state: FieldBase) -> Callable:
        """Return ``noise_step(leaves, t, key, dt) -> additive increment leaves``.

        Implements the Euler-Maruyama noise term with cell-volume-scaled variance
        and the Itô/Stratonovich/anti-Itô drift correction, mirroring
        `solvers/euler.py:66-147`.
        """
        drift_factor = self._noise_drift_factor
        has_drift = drift_factor != 0
        grid = state.grid
        from ..grids.base import cell_volumes_traced

        def get_inv_cell():
            # resolved per trace: decomposed radial shards scale the noise
            # with their own cell volumes (see grids.base.cell_volumes_traced)
            return 1.0 / cell_volumes_traced(grid)

        increments = []
        if self.use_noise_variance:
            noise_var_fn = self.make_noise_variance(state, ret_diff=has_drift)
            draw_increment = make_increment_draw()  # resolved at factory time

            def variance_term(leaves, t, key, dt):
                if has_drift:
                    variances, diffs = noise_var_fn(leaves, t)
                else:
                    variances = noise_var_fn(leaves, t)
                    diffs = None
                keys = jax.random.split(key, len(leaves))
                out = []
                dt_sqrt = jnp.sqrt(dt)
                inv_cell = get_inv_cell()
                for i, (leaf, var) in enumerate(zip(leaves, variances, strict=True)):
                    dW = draw_increment(keys[i], leaf.shape, dtype=leaf.dtype)
                    inc = dt_sqrt * jnp.sqrt(var * inv_cell) * dW
                    if has_drift:
                        inc = inc + 0.5 * dt * drift_factor * diffs[i] * inv_cell
                    out.append(inc)
                return out

            increments.append(variance_term)

        if self.use_noise_realization:
            realization_fn = self.make_noise_realization(state)

            def realization_term(leaves, t, key, dt):
                inc = realization_fn(leaves, t, key)
                dt_sqrt = jnp.sqrt(dt)
                return [dt_sqrt * x for x in inc]

            increments.append(realization_term)

        def noise_step(leaves, t, key, dt):
            out = [jnp.zeros_like(x) for x in leaves]
            for term_i, term in enumerate(increments):
                sub = jax.random.fold_in(key, term_i)
                inc = term(leaves, t, sub, dt)
                out = [a + b for a, b in zip(out, inc, strict=True)]
            return out

        return noise_step


def make_fused_window_via_expression(pde_obj, state, dt: float, rhs_str: str, bc, mesh=None):
    """Build a fused Pallas Euler window by routing through the expression
    compiler's stencil lowering (see `models/pde.py`).

    Predefined scalar PDE classes use this to get the same temporal-blocking
    kernels as expression-defined PDEs — including simple additive noise,
    which fuses as an Euler-Maruyama window whose increments replicate the
    unfused stepper's stream exactly. Raises NotImplementedError when the
    configuration is unsupported.
    """
    from .pde import PDE

    kwargs = {}
    if getattr(pde_obj, "is_sde", False):
        if (
            type(pde_obj).make_noise_variance is not SDEBase.make_noise_variance
            or pde_obj.use_noise_realization
            or pde_obj._noise_drift_factor != 0
            or np.ndim(pde_obj.noise) > 0
        ):
            raise NotImplementedError(
                "Fused window supports only additive scalar noise"
            )
        kwargs["noise"] = float(pde_obj.noise)
        kwargs["noise_interpretation"] = pde_obj.noise_interpretation

    eq = PDE({"c": rhs_str}, bc=bc, **kwargs)
    return eq.make_fused_euler_window(state, dt, mesh=mesh)


class EtdrkParts:
    """Spectral linear/nonlinear split consumed by the ETDRK4 solver.

    ``L_vals`` holds the linear operator's modal values: shape
    ``spectral_shape`` for a single field, or ``(*spectral_shape, N, N)``
    for an N-field coupled system (per-mode coupling matrices).
    ``axis_kinds`` names the diagonalizing transform per grid axis:
    ``"periodic"`` (rfft), ``"neumann"`` (DCT-II), or ``"dirichlet"``
    (DST-II). Iterating yields ``(L_vals, nonlinear_rhs)`` so the original
    two-tuple contract keeps working.
    """

    def __init__(self, L_vals, nonlinear_rhs, axis_kinds=None, n_fields=1):
        self.L_vals = L_vals
        self.nonlinear_rhs = nonlinear_rhs
        self.axis_kinds = axis_kinds
        self.n_fields = n_fields

    def __iter__(self):
        return iter((self.L_vals, self.nonlinear_rhs))


def make_etdrk_parts_via_expression(pde_obj, state, rhs_str: str, bc,
                                    rhs_state=None):
    """ETDRK spectral split for predefined scalar classes, routed through the
    expression compiler (see `PDE.make_etdrk_parts`)."""
    from .pde import PDE

    if getattr(pde_obj, "is_sde", False):
        raise NotImplementedError("ETDRK4 is deterministic; disable the noise")
    eq = PDE({"c": rhs_str}, bc=bc)
    return eq.make_etdrk_parts(state, rhs_state=rhs_state)


def expr_prod(factor: float, expression: str) -> str:
    """Helper for building expression strings with prefactors."""
    if factor == 0:
        return "0"
    if factor == 1:
        return expression
    if factor == -1:
        return f"-{expression}"
    return f"{factor:g} * {expression}"
