"""Second-order Adams-Bashforth multistep solver.

Reference: `/root/reference/pde/solvers/adams_bashforth.py:18`.
"""

from __future__ import annotations

from typing import Callable

import jax

from ..fields.base import FieldBase
from ..models.base import state_from_leaves, state_leaves
from .base import SolverBase


class AdamsBashforthSolver(SolverBase):
    """Explicit second-order Adams-Bashforth solver with Euler bootstrap.

    Fixed-dt runs take the PDE's fused Pallas AB2 window when available
    (``make_fused_ab2_window``: the carried previous-rate planes ride as
    extra fields of the multi-field kernel, halo budget identical to
    Euler); the solver bootstraps and persists the rate planes across
    tracker windows exactly like this class's XLA loop.
    """

    name = "adams-bashforth"
    _fused_window_hook = "make_fused_ab2_window"

    def _make_fixed_stepper(self, state: FieldBase, dt: float) -> Callable:
        if getattr(self.pde, "is_sde", False):
            raise RuntimeError("Adams-Bashforth does not support stochastic equations")
        fused = self._try_fused_window_stepper(state, dt)
        if fused is not None:
            return fused
        rhs = self.pde.make_pde_rhs(state)
        post_hook, post_data_init = self._make_post_step_hook(state)
        cast = self._make_dtype_cast(state)

        @jax.jit
        def run(leaves, rate_prev, t_start, steps, post_data):
            def body(i, carry):
                leaves, rate_prev, post_data = carry
                t = t_start + i * dt
                rate_cur = rhs(leaves, t)
                leaves = cast([
                    y + dt * (1.5 * rc - 0.5 * rp)
                    for y, rc, rp in zip(leaves, rate_cur, rate_prev, strict=True)
                ])
                leaves, post_data = post_hook(leaves, t + dt, post_data)
                return (leaves, rate_cur, post_data)

            return jax.lax.fori_loop(0, steps, body, (leaves, rate_prev, post_data))

        self.info.setdefault("post_step_data", post_data_init)
        self._rate_prev = None  # persists across tracker windows

        def fixed_stepper(state_obj: FieldBase, t_start: float, t_end: float):
            leaves = state_leaves(state_obj)
            if self._rate_prev is None:
                # bootstrap: estimate the previous rate from a backward Euler guess
                rate0 = rhs(leaves, t_start)
                prev_leaves = [y - dt * r for y, r in zip(leaves, rate0, strict=True)]
                self._rate_prev = rhs(prev_leaves, t_start - dt)
            steps = max(1, round((t_end - t_start) / dt))
            leaves, self._rate_prev, post_data = run(
                leaves, self._rate_prev, t_start, steps, self.info["post_step_data"]
            )
            self.info["steps"] += steps
            self.info["post_step_data"] = post_data
            return state_from_leaves(state_obj, leaves), t_start + steps * dt

        return fixed_stepper
