"""Implicit Euler solver using fixed-point iteration.

Reference: `/root/reference/pde/solvers/implicit.py:22`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.base import FieldBase
from ..models.base import PDEBase, state_leaves
from .base import ConvergenceError, SolverBase


def _mse(leaves_a, leaves_b):
    """Mean squared difference over all leaves."""
    err = 0.0
    size = 0
    for a, b in zip(leaves_a, leaves_b, strict=True):
        diff = a - b
        err = err + jnp.sum((jnp.conj(diff) * diff).real)
        size += int(np.prod(a.shape))
    return err / size


def _fixed_point(update, leaves_init, maxiter: int, maxerror2: float):
    """Iterate `update` until convergence; returns (leaves, converged)."""

    def cond(carry):
        _, _, n, err2 = carry
        return (n < maxiter) & (err2 >= maxerror2)

    def body(carry):
        leaves, _, n, _ = carry
        new_leaves = update(leaves)
        err2 = _mse(new_leaves, leaves)
        return (new_leaves, leaves, n + 1, err2)

    first = update(leaves_init)
    carry = (first, leaves_init, jnp.int32(1), _mse(first, leaves_init))
    leaves, _, n, err2 = jax.lax.while_loop(cond, body, carry)
    return leaves, err2 < maxerror2


class ImplicitSolver(SolverBase):
    """Implicit Euler solver with fixed-point iteration per step."""

    name = "implicit"

    def __init__(self, pde: PDEBase, *, maxiter: int = 100, maxerror: float = 1e-4,
                 backend: str = "auto", decomposition=None):
        super().__init__(pde, backend=backend, decomposition=decomposition)
        self.maxiter = maxiter
        self.maxerror = maxerror

    def _make_single_step_fixed_dt(self, state: FieldBase, dt: float) -> Callable:
        rhs = self.pde.make_pde_rhs(state)
        maxerror2 = self.maxerror**2
        maxiter = int(self.maxiter)
        is_sde = getattr(self.pde, "is_sde", False)
        if is_sde:
            noise_step = self.pde.make_sde_noise_step(state)

        def single_step(leaves, t, key):
            if is_sde:
                noise = noise_step(leaves, t, key, dt)
                leaves = [y + n for y, n in zip(leaves, noise, strict=True)]
            y_t = leaves

            def update(current):
                rates = rhs(current, t + dt)
                return [y0 + dt * r for y0, r in zip(y_t, rates, strict=True)]

            new_leaves, converged = _fixed_point(update, leaves, maxiter, maxerror2)
            # encode convergence failure as NaN so the controller/trackers notice;
            # the host-side check below raises ConvergenceError
            new_leaves = [
                jnp.where(converged, y, jnp.full_like(y, jnp.nan)) for y in new_leaves
            ]
            return new_leaves

        return single_step

    def _make_fixed_stepper(self, state: FieldBase, dt: float) -> Callable:
        stepper = super()._make_fixed_stepper(state, dt)

        def checked_stepper(state_obj, t_start, t_end):
            new_state, t = stepper(state_obj, t_start, t_end)
            data0 = state_leaves(new_state)[0]
            if not bool(jnp.all(jnp.isfinite(data0))):
                # distinguish convergence failures from generic blow-up is not
                # possible post-hoc; report as convergence error like the reference
                raise ConvergenceError("Implicit Euler step did not converge")
            return new_state, t

        return checked_stepper
