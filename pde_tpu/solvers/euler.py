"""Explicit Euler solver (deterministic and Euler-Maruyama).

Reference: `/root/reference/pde/solvers/euler.py:40,66-147`.
"""

from __future__ import annotations

from typing import Callable

from ..fields.base import FieldBase
from ..models.base import PDEBase
from .base import AdaptiveSolverBase


class EulerSolver(AdaptiveSolverBase):
    """Explicit (adaptive) Euler solver; solves SDEs via Euler-Maruyama."""

    name = "euler"

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

    def _make_fixed_stepper(self, state: FieldBase, dt: float) -> Callable:
        # PDEs may provide a fused, temporally-blocked window (Pallas kernel);
        # the backend sets the policy: "auto" tries it and falls back,
        # "require" (backend='pallas') makes failure an error, "never"
        # (backend='numpy') skips it
        import os

        fused_mode = self._backend_obj.fused_windows
        if os.environ.get("PDE_TPU_DISABLE_FUSED") == "1":
            if fused_mode == "require":
                raise RuntimeError(
                    "backend='pallas' requested but PDE_TPU_DISABLE_FUSED=1"
                )
            fused_mode = "never"
        if fused_mode != "never" and hasattr(self.pde, "make_fused_euler_window"):
            try:
                self.pde.make_post_step_hook(state)
                has_hook = True
            except NotImplementedError:
                has_hook = False
            window = None if has_hook else self._build_fused_window(state, dt)
            if window is not None:
                return self._wrap_fused_window(state, dt, window)
            if fused_mode == "require":
                raise RuntimeError(
                    "backend='pallas' requires the fused Pallas window, but "
                    "this configuration does not support it"
                    + (" (the PDE has a post-step hook)" if has_hook else "")
                    + f": {self.info.get('fused_unsupported', 'see logs')}"
                )
        elif fused_mode == "require":
            raise RuntimeError(
                f"backend='pallas' requires a fused Pallas window, but "
                f"{self.pde.__class__.__name__} does not provide one"
            )
        return super()._make_fixed_stepper(state, dt)

    def _build_fused_window(self, state: FieldBase, dt: float):
        """Try the PDE's fused Pallas window; None when unsupported."""
        import inspect

        mesh = self._get_mesh(state)
        try:
            if mesh is None:
                return self.pde.make_fused_euler_window(state, dt)
            # sharded variant: only PDEs whose hook accepts `mesh` support it
            sig = inspect.signature(self.pde.make_fused_euler_window)
            if "mesh" not in sig.parameters:
                self.info["fused_unsupported"] = (
                    "PDE has no sharded fused window"
                )
                return None
            return self.pde.make_fused_euler_window(state, dt, mesh=mesh)
        except NotImplementedError as err:
            self.info["fused_unsupported"] = str(err)
            return None

    def _wrap_fused_window(self, state: FieldBase, dt: float, window) -> Callable:
        import jax
        import jax.numpy as jnp

        from ..models.base import state_from_leaves, state_leaves

        mesh = self._get_mesh(state)
        n_leaves = len(state_leaves(state))
        multi = getattr(window, "multi_field", False)
        needs_key = getattr(window, "needs_key", False)
        needs_t = getattr(window, "needs_t", False)
        if mesh is None:
            self._logger.info("Using fused Pallas Euler window")
            run = jax.jit(window)
            sharding = None
        else:
            # reference equivalent: fastest kernel under MPI with halos inside
            # the compiled loop (`numba_mpi/backend.py:163-195`); here the
            # kernel runs per shard with ppermute halos once per k-step call
            from jax.sharding import PartitionSpec as P

            self._logger.info("Using sharded fused Pallas Euler window")
            if multi:
                data_spec = [mesh.partition_spec(0)] * n_leaves
            else:
                data_spec = mesh.partition_spec(0)
            # needs_key/needs_t windows take replicated extra args
            # (key and/or t0) before the step count
            n_extra = 1 + int(needs_key) + int(needs_t)
            run = jax.jit(
                jax.shard_map(
                    window,
                    mesh=mesh.jax_mesh,
                    in_specs=(data_spec,) + (P(),) * n_extra,
                    out_specs=data_spec,
                    check_vma=False,
                )
            )
            sharding = mesh.sharding(0)
        self.info["fused_step"] = True

        def fused_stepper(state_obj, t_start, t_end):
            steps = max(1, round((t_end - t_start) / dt))
            leaves = state_leaves(state_obj)
            if sharding is not None:
                leaves = [jax.device_put(x, sharding) for x in leaves]
            if needs_key:
                # same per-window key handling as the unfused SDE stepper
                self._init_key()
                self._key, key = jax.random.split(self._key)
                (data,) = leaves
                if needs_t:
                    # SDE window with t-dependent BC consts: (key, t0, steps)
                    leaves = [
                        run(data, key, jnp.asarray(t_start),
                            jnp.asarray(steps))
                    ]
                else:
                    leaves = [run(data, key, jnp.asarray(steps))]
            elif needs_t:
                # time-dependent BC values: the window rebuilds its per-step
                # const table from t_start
                if multi:
                    leaves = list(
                        run(leaves, jnp.asarray(t_start), jnp.asarray(steps))
                    )
                else:
                    (data,) = leaves
                    leaves = [
                        run(data, jnp.asarray(t_start), jnp.asarray(steps))
                    ]
            elif multi:
                leaves = list(run(leaves, jnp.asarray(steps)))
            else:
                (data,) = leaves
                leaves = [run(data, jnp.asarray(steps))]
            self.info["steps"] += steps
            return (
                state_from_leaves(state_obj, leaves),
                t_start + steps * dt,
            )

        return fused_stepper

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
