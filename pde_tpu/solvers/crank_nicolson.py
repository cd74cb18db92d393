"""Crank-Nicolson solver with fixed-point iteration.

Reference: `/root/reference/pde/solvers/crank_nicolson.py:22`.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..fields.base import FieldBase
from ..models.base import PDEBase
from .base import ConvergenceError, SolverBase
from .implicit import _fixed_point


class CrankNicolsonSolver(SolverBase):
    """Crank-Nicolson solver, optionally blended with an explicit step."""

    name = "crank-nicolson"

    def __init__(self, pde: PDEBase, *, maxiter: int = 100, maxerror: float = 1e-4,
                 explicit_fraction: float = 0, backend: str = "auto",
                 decomposition=None):
        super().__init__(pde, backend=backend, decomposition=decomposition)
        self.maxiter = maxiter
        self.maxerror = maxerror
        self.explicit_fraction = explicit_fraction

    def _make_single_step_fixed_dt(self, state: FieldBase, dt: float) -> Callable:
        if getattr(self.pde, "is_sde", False):
            raise RuntimeError(
                "Deterministic Crank-Nicolson does not support stochastic equations"
            )
        rhs = self.pde.make_pde_rhs(state)
        maxerror2 = self.maxerror**2
        maxiter = int(self.maxiter)
        alpha = self.explicit_fraction

        def single_step(leaves, t, key):
            y_t = leaves
            rate_t = rhs(y_t, t)

            def update(current):
                rate_new = rhs(current, t + dt)
                cn = [
                    y0 + 0.5 * dt * (rn + r0)
                    for y0, rn, r0 in zip(y_t, rate_new, rate_t, strict=True)
                ]
                return [
                    alpha * c_cur + (1 - alpha) * c_cn
                    for c_cur, c_cn in zip(current, cn, strict=True)
                ]

            new_leaves, converged = _fixed_point(update, leaves, maxiter, maxerror2)
            new_leaves = [
                jnp.where(converged, y, jnp.full_like(y, jnp.nan)) for y in new_leaves
            ]
            return new_leaves

        return single_step

    def _make_fixed_stepper(self, state: FieldBase, dt: float) -> Callable:
        stepper = super()._make_fixed_stepper(state, dt)

        def checked_stepper(state_obj, t_start, t_end):
            new_state, t = stepper(state_obj, t_start, t_end)
            import jax

            data0 = jax.tree_util.tree_leaves(new_state)[0]
            if not bool(jnp.all(jnp.isfinite(data0))):
                raise ConvergenceError("Crank-Nicolson step did not converge")
            return new_state, t

        return checked_stepper
