"""Milstein method for stochastic differential equations.

Reference: `/root/reference/pde/solvers/milstein.py:29`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.base import FieldBase
from ..models.base import PDEBase
from .euler import EulerSolver


class MilsteinSolver(EulerSolver):
    """Milstein method including the derivative-of-variance correction term.

    FUSED PATH (inherited ``make_fused_euler_window``): sound exactly where
    the window's gates admit it. The fused SDE window only accepts ADDITIVE
    scalar noise (state-independent variance, the default
    ``make_noise_variance``); there the Milstein correction
    ``0.5·σ·∂σ/∂y·(ΔW²−dt)`` is identically zero, the scheme coincides with
    Euler-Maruyama, and the realization matches this solver's XLA loop at
    stencil-rounding level (measured 1 ulp; same key folding). PDEs that
    OVERRIDE ``make_noise_variance`` (state-dependent σ, where the
    correction is nonzero) make the window raise, so those configurations
    always integrate through the XLA Milstein loop below — the fused path
    can never silently drop the correction term. (Reference compiles its
    Milstein loop in its fastest engine,
    `/root/reference/pde/backends/numba/_solvers.py:469`.)
    """

    name = "milstein"

    def __init__(self, pde: PDEBase, *, backend: str = "auto", adaptive: bool = False,
                 tolerance: float = 1e-4, decomposition=None):
        super().__init__(pde, backend=backend, adaptive=adaptive,
                         tolerance=tolerance, decomposition=decomposition)
        if not getattr(pde, "use_noise_variance", False):
            raise RuntimeError("Milstein solver requires `use_noise_variance` enabled")

    def _make_single_step_fixed_dt(self, state: FieldBase, dt: float) -> Callable:
        if not getattr(self.pde, "is_sde", False):
            return super()._make_single_step_fixed_dt(state, dt)

        rhs = self.pde.make_pde_rhs(state)
        drift_factor = self.pde._noise_drift_factor
        noise_var_fn = self.pde.make_noise_variance(state, ret_diff=True)
        grid = state.grid
        dt_sqrt = float(np.sqrt(dt))
        use_realization = self.pde.use_noise_realization
        if use_realization:
            realization_fn = self.pde.make_noise_realization(state)

        def single_step(leaves, t, key):
            from ..grids.base import cell_volumes_traced

            # resolved per trace: decomposed radial shards scale the noise
            # with their own cell volumes (cf. SDEBase.make_sde_noise_step)
            inv_cell = 1.0 / cell_volumes_traced(grid)
            rates = rhs(leaves, t)
            variances, diffs = noise_var_fn(leaves, t)
            if use_realization:
                sub = jax.random.fold_in(key, 1)
                extra = realization_fn(leaves, t, sub)
                leaves = [y + dt_sqrt * e for y, e in zip(leaves, extra, strict=True)]
            keys = jax.random.split(jax.random.fold_in(key, 0), len(leaves))
            out = []
            for i, (y, rate, var, diff) in enumerate(
                zip(leaves, rates, variances, diffs, strict=True)
            ):
                dW = dt_sqrt * jax.random.normal(keys[i], y.shape, dtype=y.dtype)
                y = (
                    y
                    + dt * rate
                    + 0.5 * dt * drift_factor * diff * inv_cell
                    + jnp.sqrt(var * inv_cell) * dW
                    + 0.25 * diff * inv_cell * (dW**2 - dt)
                )
                out.append(y)
            return out

        return single_step
