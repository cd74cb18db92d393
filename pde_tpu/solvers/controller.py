"""Controller running the time loop between tracker interrupts.

TPU-native re-design of `/root/reference/pde/solvers/controller.py:33`: the
controller is a thin host loop; each window between tracker interrupts runs as
ONE compiled device call (the solver's window stepper). There is no MPI
main/client split — sharded runs are SPMD, and trackers always run on the host
process from fetched device data.
"""

from __future__ import annotations

import datetime
import logging
import time
from typing import Any, Callable

import numpy as np

from ..fields.base import FieldBase
from ..trackers.base import FinishedSimulation, TrackerCollection


class Controller:
    """Class controlling a simulation."""

    _t_range: tuple[float, float]

    def __init__(self, solver, t_range, tracker="auto", *, gather_mode: str = "all"):
        if gather_mode not in ("all", "main"):
            raise ValueError("gather_mode must be 'all' or 'main'")
        self.solver = solver
        self.t_range = t_range  # type: ignore[assignment]
        self.trackers = TrackerCollection.from_data(tracker)
        self.gather_mode = gather_mode
        self._logger = logging.getLogger(self.__class__.__name__)

        self.info: dict[str, Any] = {"t_start": self.t_range[0], "t_end": self.t_range[1]}
        self.diagnostics: dict[str, Any] = {
            "controller": self.info,
            "package_version": _package_version(),
        }

    @property
    def t_range(self) -> tuple[float, float]:
        return self._t_range

    @t_range.setter
    def t_range(self, value):
        try:
            iter(value)
        except TypeError:
            self._t_range = (0.0, float(value))
        else:
            value = tuple(value)
            if len(value) == 2:
                self._t_range = (float(value[0]), float(value[1]))
            else:
                raise ValueError("t_range must be a single number or a pair of numbers")

    def _get_stop_handler(self) -> Callable:
        def handle_stop_iteration(err, t) -> tuple[int, str]:
            if isinstance(err, FinishedSimulation):
                msg = f"Simulation finished at t={t}"
                status = 0
                if hasattr(err, "value") and err.value:
                    msg += f" ({err.value})"
                self.info["stop_reason"] = msg
                return status, msg
            msg = f"Simulation aborted at t={t}"
            if err.args and err.args[0]:
                msg += f" ({err.args[0]})"
            self.info["stop_reason"] = msg
            return 1, msg

        return handle_stop_iteration

    def _make_time_sync(self) -> Callable | None:
        """Multi-process synchronization of the next interrupt time.

        On multi-host runs trackers execute on process 0 only (they perform
        host-side IO); the window end time they produce is broadcast to every
        process so the SPMD device programs stay in sync — the TPU analogue of
        the reference's rank-0 ``t_next`` broadcast with its ``-inf`` shutdown
        sentinel (`/root/reference/pde/solvers/controller.py:146-342`).
        Returns ``None`` in single-process runs (no synchronization needed).
        """
        import jax

        if jax.process_count() == 1:
            return None
        from jax.experimental import multihost_utils

        def sync(
            t_next: float, stop: bool, ok: bool = True
        ) -> tuple[float, bool, bool]:
            # the payload carries process 0's success status so client
            # processes record the same info["successful"] on a stop
            payload = np.array(
                [t_next, 1.0 if stop else 0.0, 1.0 if ok else 0.0],
                dtype=np.float64,
            )
            out = multihost_utils.broadcast_one_to_all(payload)
            return float(out[0]), bool(out[1]), bool(out[2])

        return sync

    def _make_host_gather(self) -> Callable:
        """Host-side materialization of (possibly multi-process) field data.

        On multi-process runs field data is a global ``jax.Array`` with
        non-addressable shards: host-side consumers (trackers, storage,
        plotting) cannot read it, and a one-sided fetch DEADLOCKS because the
        underlying transfer is a collective. Every process must therefore
        call the returned function at the same sequence points.

        ``gather_mode="all"`` (default) allgathers the data to
        host-replicated numpy on EVERY process. ``gather_mode="main"``
        replicates on device (the same ICI collective) but materializes the
        host copy only on process 0, where the trackers run — the analogue of
        the reference's per-interrupt MPI gather to rank 0
        (`solvers/controller.py:146-342`); client processes skip the
        device-to-host transfer and host memory entirely and receive ``None``
        (so ``run()`` returns ``None`` on clients, like the reference's
        client ranks). Identity on single-process runs (where shards are
        always addressable).
        """
        import jax

        if jax.process_count() == 1:
            return lambda state: state
        from jax.experimental import multihost_utils

        from ..fields.collection import FieldCollection

        if self.gather_mode == "main":
            from jax.sharding import NamedSharding, PartitionSpec

            is_main = jax.process_index() == 0
            replicators: dict[Any, Callable] = {}  # one jitted fn per mesh

            def gather_main(state: FieldBase) -> FieldBase | None:
                result = state.copy()
                fields = (
                    list(result)
                    if isinstance(result, FieldCollection)
                    else [result]
                )
                for fld in fields:
                    arr = fld.data
                    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
                        # replicate over the SAME device mesh (ICI
                        # collective, matched on every process) ...
                        mesh = arr.sharding.mesh
                        rep_fn = replicators.get(mesh)
                        if rep_fn is None:
                            rep_fn = jax.jit(
                                lambda x: x,
                                out_shardings=NamedSharding(
                                    mesh, PartitionSpec()
                                ),
                            )
                            replicators[mesh] = rep_fn
                        rep = rep_fn(arr)
                        # ... but fetch to host only where trackers run
                        if is_main:
                            fld._data = np.asarray(rep.addressable_data(0))
                        else:
                            fld._data = None
                return result if is_main else None

            return gather_main

        def gather(state: FieldBase) -> FieldBase:
            result = state.copy()
            fields = (
                list(result) if isinstance(result, FieldCollection) else [result]
            )
            for fld in fields:
                arr = fld.data
                if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
                    fld._data = multihost_utils.process_allgather(arr, tiled=True)
            return result

        return gather

    def run(self, initial_state: FieldBase, dt: float | None = None) -> FieldBase | None:
        """Run the simulation; returns the final state.

        Reference: `solvers/controller.py:410`. On multi-process (multi-host)
        runs, trackers run on process 0 only and interrupt times are
        broadcast (see :meth:`_make_time_sync`).
        """
        import jax

        t_start, t_end = self.t_range
        state = initial_state.copy()
        sync = self._make_time_sync()
        gather = self._make_host_gather()  # collective: call on EVERY process
        is_main = jax.process_index() == 0
        if sync is not None and not is_main:
            # client processes: no host-side tracker actions
            self.trackers = TrackerCollection([])

        # initialize the stepper (compilation happens lazily on first call)
        compile_start = time.monotonic()
        stepper = self.solver.make_stepper(state, dt)
        profiler = {"compilation": time.monotonic() - compile_start,
                    "solver": 0.0, "tracker": 0.0}
        self.info["profiler"] = profiler
        self.info["solver_class"] = self.solver.__class__.__name__
        self.diagnostics["solver"] = self.solver.info

        handle_stop = self._get_stop_handler()

        # initialize trackers
        tracker_start = time.monotonic()
        try:
            t_tracker = self.trackers.initialize(
                gather(state), info=self.diagnostics
            )
        except StopIteration as err:
            status, msg = handle_stop(err, t_start)
            self.trackers.finalize(info=self.diagnostics)
            self.info["successful"] = status == 0
            if sync is not None:
                sync(t_start, True, ok=status == 0)
            return gather(state)
        if sync is not None:
            t_tracker, stop, ok = sync(t_tracker, False)
            if stop:  # process 0 stopped during initialization
                self.info["successful"] = ok
                return gather(state)
        profiler["tracker"] += time.monotonic() - tracker_start

        self.info["solver_start"] = str(datetime.datetime.now())
        solver_start = time.monotonic()
        t = t_start
        successful = True
        msg = None
        atol = 1e-12 * max(1.0, abs(t_end))

        try:
            while t < t_end - atol:
                # let trackers handle the current state
                tracker_start = time.monotonic()
                try:
                    t_tracker = self.trackers.handle(gather(state), t)
                except StopIteration as err:
                    status, msg = handle_stop(err, t)
                    successful = status == 0
                    if sync is not None:
                        sync(t, True, ok=successful)
                    break
                if sync is not None:
                    t_tracker, stop, ok = sync(t_tracker, False)
                    if stop:
                        successful = ok
                        break
                profiler["tracker"] += time.monotonic() - tracker_start

                # advance to the next interrupt (one compiled device call)
                t_break = min(t_tracker, t_end)
                if t_break <= t + atol:
                    t_break = t_end
                step_start = time.monotonic()
                state, t = stepper(state, t, t_break)
                profiler["solver"] += time.monotonic() - step_start
            else:
                # final tracker handling at the end
                tracker_start = time.monotonic()
                try:
                    self.trackers.handle(gather(state), t)
                except StopIteration as err:
                    status, msg = handle_stop(err, t)
                    successful = status == 0
                if sync is not None:
                    # propagate process 0's status for aborts raised at the
                    # FINAL interrupt too (each process reaches this point
                    # when its loop completes, so the collective is matched)
                    _, _, ok = sync(t, True, ok=successful)
                    successful = successful and ok
                profiler["tracker"] += time.monotonic() - tracker_start
        except KeyboardInterrupt:
            msg = f"Simulation interrupted at t={t}"
            successful = False
            self.diagnostics["last_state"] = state
        finally:
            self.info["solver_duration"] = str(
                datetime.timedelta(seconds=time.monotonic() - solver_start)
            )
            self.info["t_final"] = t
            self.info["successful"] = successful
            self.trackers.finalize(info=self.diagnostics)

        if msg:
            self._logger.info(msg)
        if profiler["tracker"] > max(profiler["solver"], 1) and profiler["solver"] > 0:
            self._logger.warning(
                "Spent more time on handling trackers (%.3g s) than on the actual "
                "simulation (%.3g s)", profiler["tracker"], profiler["solver"],
            )
        return gather(state)


def _package_version() -> str:
    import pde_tpu

    return pde_tpu.__version__
