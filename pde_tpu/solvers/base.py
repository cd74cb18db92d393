"""Base classes for PDE solvers with fully compiled time loops.

TPU-native re-design of `/root/reference/pde/solvers/base.py:50,335`. The key
inversion vs the reference: steppers are pure functions jitted ONCE and the
entire multi-step window runs on device via `lax.fori_loop` (fixed dt) or
`lax.while_loop` (adaptive dt), instead of the reference's Python loop around a
jitted single step (`backends/jax/_solvers.py:79-94`). Host↔device transfer
happens only at tracker interrupts.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.base import FieldBase
from ..models.base import PDEBase, state_from_leaves, state_leaves
from ..utils.math import OnlineStatistics


class ConvergenceError(RuntimeError):
    """Indicates that an implicit step did not converge."""


def adjust_dt(dt_step, error_rel):
    """Propose the next time step from the relative error of the last one.

    Mirrors the reference's adjuster (`/root/reference/pde/solvers/base.py:533`):
    ``new_dt = dt * clip(0.9 * error_rel**-0.2, 0.1, 4.0)``, with non-finite
    errors (NaN/inf state) treated as failures that shrink dt by 4x. The 4x
    growth cap binds when ``0.9 * error_rel**-0.2 >= 4``, i.e.
    ``error_rel <= (0.9/4)**5 = 0.000576650390625``; that crossover is the
    first branch below, so tiny errors grow dt by exactly the 4x cap.
    """
    finite = jnp.isfinite(error_rel)
    return jnp.where(
        error_rel < (0.9 / 4.0) ** 5,
        dt_step * 4.0,
        jnp.where(
            ~finite,
            dt_step * 0.25,
            dt_step * jnp.maximum(0.9 * jnp.abs(error_rel) ** -0.2, 0.1),
        ),
    )


class SolverBase:
    """Base class for PDE solvers."""

    name: str | None = None
    dt_default: float = 1e-3

    #: PDE method name providing a fused Pallas temporal-blocking window for
    #: this solver's fixed-dt scheme (None = no fused path; the reference's
    #: fastest engine compiles every solver's loop,
    #: `/root/reference/pde/backends/numba/_solvers.py:469`)
    _fused_window_hook: str | None = None

    _subclasses: dict[str, type[SolverBase]] = {}

    def __init__(self, pde: PDEBase, *, backend: str = "auto", decomposition=None):
        from ..backends import get_backend

        self.pde = pde
        self.backend = backend
        try:
            # the backend object governs stepper compilation and the fused-
            # window policy: "jax"/"auto" = compiled + auto-fused, "pallas" =
            # fused REQUIRED, "numpy" = eager Python loops (debugging)
            self._backend_obj = get_backend(backend)
        except KeyError:
            from ..backends import registered_backends

            raise ValueError(
                f"Unknown backend `{backend}`; registered backends: "
                f"{registered_backends()}"
            ) from None
        if (
            self._backend_obj.fused_windows == "require"
            and self._fused_window_hook is None
        ):
            # construction-time check: solvers overriding the stepper
            # builders (Adams-Bashforth, scipy, ...) would otherwise
            # silently run their XLA loops under backend='pallas'
            raise RuntimeError(
                f"backend='pallas' is not supported by "
                f"{self.__class__.__name__}: no fused kernel path"
            )
        self.decomposition = decomposition  # device-mesh domain decomposition
        self._mesh = None
        self.info: dict[str, Any] = {
            "class": self.__class__.__name__,
            "pde_class": self.pde.__class__.__name__ if pde is not None else None,
            "dt": None,
            "steps": 0,
            "state_modifications": 0.0,
            "stochastic": getattr(pde, "is_sde", False) if pde is not None else False,
            "backend": self._backend_obj.name,
        }
        self._logger = logging.getLogger(self.__class__.__name__)
        self._key = None  # device PRNG key, created lazily

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if cls.__name__ not in SolverBase._subclasses:
            SolverBase._subclasses[cls.__name__] = cls
        if hasattr(cls, "name") and cls.name:
            if (
                cls.name in SolverBase._subclasses
                and SolverBase._subclasses[cls.name] is not cls
            ):
                logging.getLogger(__name__).warning(
                    "Solver name `%s` is redefined by %s", cls.name, cls.__name__
                )
            SolverBase._subclasses[cls.name] = cls

    @classmethod
    def from_name(cls, name: str, pde: PDEBase, **kwargs) -> SolverBase:
        """Create a solver from its registered name (reference `base.py:110`)."""
        try:
            solver_cls = cls._subclasses[name]
        except KeyError:
            raise ValueError(
                f"Unknown solver method `{name}`; registered solvers: "
                f"{registered_solvers()}"
            ) from None
        return solver_cls(pde, **kwargs)

    @property
    def _compiled(self) -> bool:
        return True

    def _init_key(self):
        if self._key is None:
            from ..utils.config import config

            seed = int(self.pde.rng.integers(0, 2**31 - 1)) if self.pde else 0
            # 'rbg'/'unsafe_rbg' route bit generation through the XLA
            # RngBitGenerator (the TPU's hardware PRNG) — SDE stepping is
            # noise-generation-bound (docs/BENCHMARKS.md), and threefry is
            # the dominant cost; key split/fold_in semantics are preserved
            impl = str(config["sde.rng_impl"])
            self._key = jax.random.key(seed, impl=impl)
            self.info["rng_impl"] = impl

    @staticmethod
    def _make_dtype_cast(state: FieldBase):
        """Pin leaf dtypes: python-float coefficients must not promote f32
        states to f64 when x64 is enabled (would break loop carries)."""
        dtypes = [x.dtype for x in state_leaves(state)]

        def cast(leaves):
            return [
                jnp.asarray(x, d) for x, d in zip(leaves, dtypes, strict=True)
            ]

        return cast

    # -- post-step hooks -----------------------------------------------------------------------
    def _make_post_step_hook(self, state: FieldBase):
        """Returns (hook(leaves, t, data) -> (leaves, data), init_data)."""
        try:
            return self.pde.make_post_step_hook(state)
        except NotImplementedError:
            def no_hook(leaves, t, data):
                return leaves, data

            return no_hook, 0.0

    # -- single-step constructors (overridden by concrete solvers) -------------------------------
    def _make_single_step_fixed_dt(self, state: FieldBase, dt: float) -> Callable:
        """Return ``step(leaves, t, key) -> leaves`` for one fixed-dt step.

        The default implementation is an explicit Euler step, mirroring the
        reference's generic fixed stepper (`solvers/base.py:248`).
        """
        rhs = self.pde.make_pde_rhs(state)

        def single_step(leaves, t, key):
            rates = rhs(leaves, t)
            return [y + dt * r for y, r in zip(leaves, rates, strict=True)]

        return single_step

    # -- domain decomposition -----------------------------------------------------------------------
    def _get_mesh(self, state: FieldBase):
        """Return the GridMesh for decomposed runs (None for single-device)."""
        if self.decomposition is None:
            return None
        if self._mesh is None:
            from ..parallel.mesh import GridMesh

            self._mesh = GridMesh.from_grid(state.grid, self.decomposition)
            self.info["decomposition"] = list(self._mesh.decomposition)
        return self._mesh

    @staticmethod
    def _leaf_ranks(state: FieldBase) -> list[int]:
        from ..fields.collection import FieldCollection

        if isinstance(state, FieldCollection):
            return [f.rank for f in state]
        return [state.rank]  # type: ignore[list-item]

    # -- fused Pallas windows -----------------------------------------------------------------------
    def _try_fused_window_stepper(self, state: FieldBase, dt: float):
        """Return a fused-window stepper, or None to use the XLA loop.

        The backend sets the policy: "auto" tries the PDE's fused window and
        falls back, "require" (backend='pallas') makes failure an error,
        "never" (backend='numpy') skips it.
        """
        import os

        fused_mode = self._backend_obj.fused_windows
        if os.environ.get("PDE_TPU_DISABLE_FUSED") == "1":
            if fused_mode == "require":
                raise RuntimeError(
                    "backend='pallas' requested but PDE_TPU_DISABLE_FUSED=1"
                )
            fused_mode = "never"
        if fused_mode == "never":
            return None
        hook = self._fused_window_hook
        if hook is None:
            if fused_mode == "require":
                raise RuntimeError(
                    f"backend='pallas' is not supported by "
                    f"{self.__class__.__name__}: no fused kernel path"
                )
            return None
        if not hasattr(self.pde, hook):
            if fused_mode == "require":
                raise RuntimeError(
                    f"backend='pallas' requires a fused Pallas window, but "
                    f"{self.pde.__class__.__name__} does not provide one"
                )
            return None
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
        return None

    def _build_fused_window(self, state: FieldBase, dt: float):
        """Try the PDE's fused Pallas window; None when unsupported."""
        import inspect

        make_window = getattr(self.pde, self._fused_window_hook)
        mesh = self._get_mesh(state)
        try:
            if mesh is None:
                return make_window(state, dt)
            # sharded variant: only PDEs whose hook accepts `mesh` support it
            sig = inspect.signature(make_window)
            if "mesh" not in sig.parameters:
                self.info["fused_unsupported"] = (
                    "PDE has no sharded fused window"
                )
                return None
            return make_window(state, dt, mesh=mesh)
        except NotImplementedError as err:
            self.info["fused_unsupported"] = str(err)
            return None

    def _wrap_fused_window(self, state: FieldBase, dt: float, window) -> Callable:
        from ..models.base import state_from_leaves, state_leaves

        mesh = self._get_mesh(state)
        n_leaves = len(state_leaves(state))
        multi = getattr(window, "multi_field", False)
        needs_key = getattr(window, "needs_key", False)
        needs_t = getattr(window, "needs_t", False)
        # multistep windows carry auxiliary planes (AB2: previous rates)
        # appended to the state leaves; the solver bootstraps them exactly
        # like its unfused stepper and persists them across tracker windows
        n_aux = getattr(window, "n_aux", 0)
        if n_aux:
            rhs = self.pde.make_pde_rhs(state)

            @jax.jit
            def bootstrap_aux(leaves, t0):
                rate0 = rhs(leaves, t0)
                prev = [
                    y - dt * r for y, r in zip(leaves, rate0, strict=True)
                ]
                return list(rhs(prev, t0 - dt))

            self._fused_aux = None
        if mesh is None:
            self._logger.info("Using fused Pallas %s window", self.name)
            run = jax.jit(window)
            sharding = None
        else:
            # reference equivalent: fastest kernel under MPI with halos inside
            # the compiled loop (`numba_mpi/backend.py:163-195`); here the
            # kernel runs per shard with ppermute halos once per k-step call
            from jax.sharding import PartitionSpec as P

            self._logger.info("Using sharded fused Pallas %s window", self.name)
            if multi:
                data_spec = [mesh.partition_spec(0)] * (n_leaves + n_aux)
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
                if n_aux:
                    if self._fused_aux is None:
                        self._fused_aux = bootstrap_aux(leaves, t_start)
                        if sharding is not None:
                            self._fused_aux = [
                                jax.device_put(x, sharding)
                                for x in self._fused_aux
                            ]
                    out = list(run(
                        leaves + list(self._fused_aux),
                        jnp.asarray(t_start), jnp.asarray(steps),
                    ))
                    leaves, self._fused_aux = out[:n_leaves], out[n_leaves:]
                elif multi:
                    leaves = list(
                        run(leaves, jnp.asarray(t_start), jnp.asarray(steps))
                    )
                else:
                    (data,) = leaves
                    leaves = [
                        run(data, jnp.asarray(t_start), jnp.asarray(steps))
                    ]
            elif n_aux:
                if self._fused_aux is None:
                    self._fused_aux = bootstrap_aux(leaves, t_start)
                    if sharding is not None:
                        self._fused_aux = [
                            jax.device_put(x, sharding)
                            for x in self._fused_aux
                        ]
                out = list(
                    run(leaves + list(self._fused_aux), jnp.asarray(steps))
                )
                leaves, self._fused_aux = out[:n_leaves], out[n_leaves:]
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

    # -- compiled window steppers -------------------------------------------------------------------
    def _make_fixed_stepper(self, state: FieldBase, dt: float) -> Callable:
        """Compile a device loop performing N fixed steps per call."""
        mesh = self._get_mesh(state)
        fused = self._try_fused_window_stepper(state, dt)
        if fused is not None:
            return fused
        if not self._backend_obj.compiled_steppers:
            if mesh is not None:
                raise RuntimeError(
                    "backend='numpy' (eager) cannot drive decomposed runs — "
                    "shard_map requires compiled execution"
                )
            return self._make_fixed_stepper_eager(state, dt)
        if mesh is not None:
            return self._make_fixed_stepper_sharded(state, dt, mesh)
        single_step = self._make_single_step_fixed_dt(state, dt)
        post_hook, post_data_init = self._make_post_step_hook(state)
        is_sde = self.info["stochastic"]
        cast = self._make_dtype_cast(state)

        @jax.jit
        def run(leaves, key, t_start, steps, post_data):
            def body(i, carry):
                leaves, key, post_data = carry
                t = t_start + i * dt
                if is_sde:
                    sub = jax.random.fold_in(key, i)
                else:
                    sub = key
                leaves = cast(single_step(leaves, t, sub))
                leaves, post_data = post_hook(leaves, t + dt, post_data)
                return (leaves, key, post_data)

            leaves, key, post_data = jax.lax.fori_loop(
                0, steps, body, (leaves, key, post_data)
            )
            return leaves, post_data

        self.info.setdefault("post_step_data", post_data_init)

        def fixed_stepper(state_obj: FieldBase, t_start: float, t_end: float):
            self._init_key()
            steps = max(1, round((t_end - t_start) / dt))
            leaves = state_leaves(state_obj)
            if self.info["stochastic"]:
                self._key, key = jax.random.split(self._key)
            else:
                key = self._key
            leaves, post_data = run(
                leaves, key, t_start, steps, self.info["post_step_data"]
            )
            self.info["steps"] += steps
            self.info["post_step_data"] = post_data
            return state_from_leaves(state_obj, leaves), t_start + steps * dt

        return fixed_stepper

    def _make_fixed_stepper_eager(self, state: FieldBase, dt: float) -> Callable:
        """Uncompiled Python step loop (the ``numpy`` debug backend).

        Mirrors the reference numpy backend's stepper — identity
        ``compile_function`` around a plain loop
        (`/root/reference/pde/backends/numpy/backend.py:36`); breakpoints
        and prints work inside the rhs because nothing is traced.
        """
        single_step = self._make_single_step_fixed_dt(state, dt)
        post_hook, post_data_init = self._make_post_step_hook(state)
        is_sde = self.info["stochastic"]
        cast = self._make_dtype_cast(state)
        self.info.setdefault("post_step_data", post_data_init)

        def fixed_stepper(state_obj: FieldBase, t_start: float, t_end: float):
            self._init_key()
            steps = max(1, round((t_end - t_start) / dt))
            leaves = state_leaves(state_obj)
            if is_sde:
                self._key, key = jax.random.split(self._key)
            else:
                key = self._key
            post_data = self.info["post_step_data"]
            for i in range(steps):
                t = t_start + i * dt
                sub = jax.random.fold_in(key, i) if is_sde else key
                leaves = cast(single_step(leaves, t, sub))
                leaves, post_data = post_hook(leaves, t + dt, post_data)
            self.info["steps"] += steps
            self.info["post_step_data"] = post_data
            return state_from_leaves(state_obj, leaves), t_start + steps * dt

        return fixed_stepper

    def _make_fixed_stepper_sharded(self, state: FieldBase, dt: float, mesh) -> Callable:
        """Fixed-dt window loop running under shard_map over the device mesh.

        Replaces the reference's ExplicitMPISolver (`solvers/explicit_mpi.py:24`):
        halo exchange happens via ppermute inside each rhs evaluation; there is
        no scatter/gather per window — data stays sharded on the devices.
        """
        from jax.sharding import PartitionSpec as P

        local_template = mesh.extract_subfield(state)
        single_step = self._make_single_step_fixed_dt(local_template, dt)
        post_hook, post_data_init = self._make_post_step_hook(local_template)
        is_sde = self.info["stochastic"]
        cast = self._make_dtype_cast(state)
        ranks = self._leaf_ranks(state)
        leaf_specs = [mesh.partition_spec(r) for r in ranks]
        rep = P()
        axis_names = mesh.axis_names

        def window(leaves, key, t_start, steps, post_data):
            if is_sde:
                # decorrelate the noise between shards
                for name in axis_names:
                    key = jax.random.fold_in(key, jax.lax.axis_index(name))

            def body(i, carry):
                leaves, key, post_data = carry
                t = t_start + i * dt
                sub = jax.random.fold_in(key, i) if is_sde else key
                leaves = cast(single_step(leaves, t, sub))
                leaves, post_data = post_hook(leaves, t + dt, post_data)
                return (leaves, key, post_data)

            leaves, key, post_data = jax.lax.fori_loop(
                0, steps, body, (leaves, key, post_data)
            )
            return leaves, post_data

        sharded_window = jax.jit(
            jax.shard_map(
                window,
                mesh=mesh.jax_mesh,
                in_specs=(leaf_specs, rep, rep, rep, rep),
                out_specs=(leaf_specs, rep),
                check_vma=False,
            )
        )

        self.info.setdefault("post_step_data", post_data_init)
        shardings = [
            jax.NamedSharding(mesh.jax_mesh, spec) for spec in leaf_specs
        ]

        def fixed_stepper(state_obj: FieldBase, t_start: float, t_end: float):
            self._init_key()
            steps = max(1, round((t_end - t_start) / dt))
            leaves = [
                jax.device_put(x, s)
                for x, s in zip(state_leaves(state_obj), shardings, strict=True)
            ]
            if is_sde:
                self._key, key = jax.random.split(self._key)
            else:
                key = self._key
            leaves, post_data = sharded_window(
                leaves, key, jnp.asarray(t_start), jnp.asarray(steps),
                self.info["post_step_data"],
            )
            self.info["steps"] += steps
            self.info["post_step_data"] = post_data
            return state_from_leaves(state_obj, leaves), t_start + steps * dt

        return fixed_stepper

    def make_stepper(self, state: FieldBase, dt: float | None = None) -> Callable:
        """Return ``stepper(state, t_start, t_end) -> (state, t_reached)``.

        Reference: `solvers/base.py:298`.
        """
        dt_float = float(dt) if dt is not None else self.dt_default
        self.info["dt"] = dt_float
        self.info["dt_adaptive"] = False
        return self._make_fixed_stepper(state, dt_float)


class AdaptiveSolverBase(SolverBase):
    """Base class for solvers supporting adaptive time stepping.

    Reference: `solvers/base.py:335`.
    """

    dt_min: float = 1e-10
    dt_max: float = 1e10

    def __init__(
        self,
        pde: PDEBase,
        *,
        backend: str = "auto",
        adaptive: bool = False,
        tolerance: float = 1e-4,
        decomposition=None,
    ):
        super().__init__(pde, backend=backend, decomposition=decomposition)
        self.adaptive = adaptive
        self.tolerance = tolerance

    def _make_single_step_error_estimate(self, state: FieldBase) -> Callable:
        """Return ``estimate(leaves, t, dt) -> (new_leaves, error)``.

        Default: explicit Euler step doubling (reference `solvers/euler.py:240`).
        """
        if getattr(self.pde, "is_sde", False):
            raise RuntimeError("Cannot use adaptive stepping with stochastic equations")
        rhs = self.pde.make_pde_rhs(state)

        def estimate(leaves, t, dt):
            rate = rhs(leaves, t)
            step_large = [y + dt * r for y, r in zip(leaves, rate, strict=True)]
            half = [y + 0.5 * dt * r for y, r in zip(leaves, rate, strict=True)]
            rate_mid = rhs(half, t + 0.5 * dt)
            step_small = [
                y + 0.5 * dt * r for y, r in zip(half, rate_mid, strict=True)
            ]
            error = 0.0
            for a, b in zip(step_large, step_small, strict=True):
                error = jnp.maximum(error, jnp.max(jnp.abs(a - b)))
            return step_small, error

        return estimate

    def _make_adaptive_stepper(self, state: FieldBase) -> Callable:
        """Compile an adaptive `while_loop` advancing from t_start to t_end."""
        mesh = self._get_mesh(state)
        if mesh is not None:
            local_template = mesh.extract_subfield(state)
            estimate = self._make_single_step_error_estimate(local_template)
            post_hook, post_data_init = self._make_post_step_hook(local_template)
            # adaptive-dt error synchronized across shards (reference:
            # MPI allreduce-MAX, `backends/numba/_solvers.py:227-261`)
            sync_names = tuple(
                name
                for name, n in zip(mesh.axis_names, mesh.decomposition, strict=True)
                if n > 1
            )
            sync_error = lambda err: jax.lax.pmax(err, sync_names) if sync_names else err
        else:
            estimate = self._make_single_step_error_estimate(state)
            post_hook, post_data_init = self._make_post_step_hook(state)
            sync_error = self._make_error_synchronizer()
        cast = self._make_dtype_cast(state)
        tolerance = self.tolerance
        dt_min = self.dt_min
        dt_max = self.dt_max

        def run(leaves, t_start, t_end, dt_init, post_data):
            def cond(carry):
                _, t, _, _, ok, _, _ = carry
                return (t < t_end) & ok

            def body(carry):
                leaves, t, dt_opt, steps, ok, stats, post_data = carry
                dt_step = jnp.maximum(jnp.minimum(dt_opt, t_end - t), dt_min)
                new_leaves, error = estimate(leaves, t, dt_step)
                new_leaves = cast(new_leaves)
                error_rel = sync_error(error / tolerance)
                # also treat non-finite states as failures
                finite = jnp.isfinite(error_rel)
                accept = finite & (error_rel <= 1.0)

                leaves = [
                    jnp.where(accept, n, o)
                    for n, o in zip(new_leaves, leaves, strict=True)
                ]
                t_new = jnp.where(accept, t + dt_step, t)
                hook_leaves, post_data_new = post_hook(leaves, t_new, post_data)
                leaves = [
                    jnp.where(accept, h, o)
                    for h, o in zip(hook_leaves, leaves, strict=True)
                ]
                post_data = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(accept, n, o), post_data_new, post_data
                )
                steps = steps + accept.astype(jnp.int32)
                # dt statistics (count, sum, min, max) for accepted steps
                count, total, mn, mx = stats
                stats = (
                    count + accept.astype(jnp.int32),
                    total + jnp.where(accept, dt_step, 0.0),
                    jnp.where(accept, jnp.minimum(mn, dt_step), mn),
                    jnp.where(accept, jnp.maximum(mx, dt_step), mx),
                )
                dt_adj = adjust_dt(dt_step, error_rel)
                dt_opt = jnp.clip(dt_adj, dt_min, dt_max)
                ok = dt_adj >= dt_min
                return (leaves, t_new, dt_opt, steps, ok, stats, post_data)

            stats0 = (
                jnp.int32(0),
                jnp.zeros(()),
                jnp.full((), jnp.inf),
                jnp.full((), -jnp.inf),
            )
            carry = (
                leaves,
                jnp.asarray(t_start, dtype=jnp.result_type(float)),
                jnp.asarray(dt_init, dtype=jnp.result_type(float)),
                jnp.int32(0),
                jnp.bool_(True),
                stats0,
                post_data,
            )
            leaves, t, dt_opt, steps, ok, stats, post_data = jax.lax.while_loop(
                cond, body, carry
            )
            return leaves, t, dt_opt, steps, ok, stats, post_data

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            ranks = self._leaf_ranks(state)
            leaf_specs = [mesh.partition_spec(r) for r in ranks]
            rep = P()
            run = jax.jit(
                jax.shard_map(
                    run,
                    mesh=mesh.jax_mesh,
                    in_specs=(leaf_specs, rep, rep, rep, rep),
                    out_specs=(leaf_specs, rep, rep, rep, rep, (rep,) * 4, rep),
                    check_vma=False,
                )
            )
            shardings = [jax.NamedSharding(mesh.jax_mesh, s) for s in leaf_specs]
        else:
            run = jax.jit(run)
            shardings = None

        self.info.setdefault("post_step_data", post_data_init)
        self.info["dt_statistics"] = OnlineStatistics()

        def adaptive_stepper(state_obj: FieldBase, t_start: float, t_end: float):
            leaves = state_leaves(state_obj)
            if shardings is not None:
                leaves = [
                    jax.device_put(x, s)
                    for x, s in zip(leaves, shardings, strict=True)
                ]
            dt_opt = self.info["dt"] or self.dt_default
            leaves, t, dt_opt, steps, ok, stats, post_data = run(
                leaves, jnp.asarray(t_start), jnp.asarray(t_end),
                jnp.asarray(dt_opt), self.info["post_step_data"]
            )
            if not bool(ok):
                raise RuntimeError(f"Time step below dt_min={self.dt_min}")
            self.info["dt"] = float(dt_opt)
            self.info["steps"] += int(steps)
            self.info["post_step_data"] = post_data
            self.info["dt_statistics"].add_batch(
                int(stats[0]), float(stats[1]), float(stats[2]), float(stats[3])
            )
            return state_from_leaves(state_obj, leaves), float(t)

        return adaptive_stepper

    def _make_error_synchronizer(self) -> Callable:
        """Synchronize errors across devices (identity on a single device)."""
        return lambda error: error

    def make_stepper(self, state: FieldBase, dt: float | None = None) -> Callable:
        if dt is None and self.adaptive:
            dt = self.dt_default
        dt_float = float(dt) if dt is not None else self.dt_default
        self.info["dt"] = dt_float
        self.info["dt_adaptive"] = bool(self.adaptive)
        if self.adaptive:
            if not self._backend_obj.compiled_steppers:
                raise NotImplementedError(
                    "backend='numpy' (eager) supports fixed-dt stepping only"
                )
            if self._backend_obj.fused_windows == "require":
                raise RuntimeError(
                    "backend='pallas' has no adaptive-dt kernel path"
                )
            return self._make_adaptive_stepper(state)
        return self._make_fixed_stepper(state, dt_float)


def registered_solvers() -> list[str]:
    """List of all registered solver names."""
    return sorted(k for k in SolverBase._subclasses if k[0].islower())
