"""Explicit Euler solver (deterministic and Euler-Maruyama).

Reference: `/root/reference/pde/solvers/euler.py:40,66-147`.
"""

from __future__ import annotations

from typing import Callable

from ..fields.base import FieldBase
from ..models.base import PDEBase
from .base import AdaptiveSolverBase


class EulerSolver(AdaptiveSolverBase):
    """Explicit (adaptive) Euler solver; solves SDEs via Euler-Maruyama.

    PDEs may provide a fused, temporally-blocked Pallas window
    (``make_fused_euler_window``); the inherited
    :meth:`SolverBase._try_fused_window_stepper` applies the backend's
    fused-window policy before falling back to the XLA loop.
    """

    name = "euler"
    _fused_window_hook = "make_fused_euler_window"

    def __init__(
        self,
        pde: PDEBase,
        *,
        backend: str = "auto",
        adaptive: bool = False,
        tolerance: float = 1e-4,
        decomposition=None,
    ):
        super().__init__(pde, backend=backend, adaptive=adaptive,
                         tolerance=tolerance, decomposition=decomposition)

    def _make_single_step_fixed_dt(self, state: FieldBase, dt: float) -> Callable:
        rhs = self.pde.make_pde_rhs(state)
        if getattr(self.pde, "is_sde", False):
            noise_step = self.pde.make_sde_noise_step(state)

            def single_step_sde(leaves, t, key):
                rates = rhs(leaves, t)
                noise = noise_step(leaves, t, key, dt)
                return [
                    y + dt * r + n
                    for y, r, n in zip(leaves, rates, noise, strict=True)
                ]

            return single_step_sde

        def single_step(leaves, t, key):
            rates = rhs(leaves, t)
            return [y + dt * r for y, r in zip(leaves, rates, strict=True)]

        return single_step

    def make_stepper(self, state, dt=None):
        if self.adaptive and getattr(self.pde, "is_sde", False):
            raise RuntimeError("Cannot use adaptive stepping with stochastic equations")
        return super().make_stepper(state, dt)


class ExplicitSolver(EulerSolver):
    """Deprecated alias of :class:`EulerSolver` (reference `euler.py:292`)."""

    name = "explicit"
