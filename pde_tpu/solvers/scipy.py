"""Solver wrapping :func:`scipy.integrate.solve_ivp` (host execution).

Reference: `/root/reference/pde/solvers/scipy.py:23`.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..fields.base import FieldBase
from ..models.base import PDEBase, state_from_leaves, state_leaves
from .base import SolverBase


class ScipySolver(SolverBase):
    """Solver using scipy.integrate.solve_ivp; the rhs runs jitted on device."""

    name = "scipy"

    def __init__(self, pde: PDEBase, *, backend: str = "auto", **kwargs):
        super().__init__(pde, backend=backend)
        self.solver_params = kwargs

    def make_stepper(self, state: FieldBase, dt: float | None = None) -> Callable:
        if getattr(self.pde, "is_sde", False):
            raise RuntimeError("Cannot use scipy stepper with stochastic equations")
        import jax

        from scipy import integrate

        leaves_template = state_leaves(state)
        shapes = [x.shape for x in leaves_template]
        sizes = [int(np.prod(s)) for s in shapes]
        splits = np.cumsum(sizes)[:-1]
        rhs = jax.jit(self.pde.make_pde_rhs(state))

        def rhs_flat(t, y_flat):
            pieces = np.split(y_flat, splits)
            leaves = [p.reshape(s) for p, s in zip(pieces, shapes, strict=True)]
            rates = rhs(leaves, t)
            return np.concatenate([np.ravel(np.asarray(r)) for r in rates])

        solver_params = dict(self.solver_params)
        if dt is not None:
            solver_params.setdefault("first_step", min(dt, 1e-2))
        self.info["dt"] = dt
        self.info["stochastic"] = False

        def stepper(state_obj: FieldBase, t_start: float, t_end: float):
            leaves = state_leaves(state_obj)
            y0 = np.concatenate([np.ravel(np.asarray(x)) for x in leaves])
            sol = integrate.solve_ivp(
                rhs_flat, t_span=(t_start, t_end), y0=y0, t_eval=np.array([t_end]),
                **solver_params,
            )
            if not sol.success:
                raise RuntimeError(f"solve_ivp failed: {sol.message}")
            self.info["steps"] += int(sol.nfev)
            pieces = np.split(sol.y[:, 0], splits)
            import jax.numpy as jnp

            new_leaves = [
                jnp.asarray(p.reshape(s)) for p, s in zip(pieces, shapes, strict=True)
            ]
            return state_from_leaves(state_obj, new_leaves), float(sol.t[-1])

        return stepper
