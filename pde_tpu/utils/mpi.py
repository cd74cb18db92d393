"""Compatibility shim mapping the reference's MPI helpers to JAX processes.

The reference (`/root/reference/pde/tools/mpi.py`) wraps mpi4py; in this
framework multi-device execution is SPMD over a `jax.sharding.Mesh`, typically
in ONE process. Multi-process (multi-host) runs use JAX distributed
initialization, and these helpers expose the equivalent rank/size notions.
"""

from __future__ import annotations

from typing import Any


def _initialized() -> bool:
    import jax

    try:
        return jax.process_count() >= 1
    except RuntimeError:
        return False


def __getattr__(name: str) -> Any:
    # lazily computed module attributes (do not initialize jax at import time)
    import jax

    if name == "size":
        return jax.process_count()
    if name == "rank":
        return jax.process_index()
    if name == "is_main":
        return jax.process_index() == 0
    if name == "initialized":
        return _initialized()
    if name == "parallel_run":
        return jax.process_count() > 1
    raise AttributeError(name)


def mpi_send(data, dest: int, tag: int = 0) -> None:
    raise NotImplementedError(
        "Point-to-point messaging is not exposed; use shard_map with "
        "lax.ppermute for halo exchange (see pde_tpu.parallel)"
    )


def mpi_recv(data, source: int, tag: int = 0) -> None:
    raise NotImplementedError(
        "Point-to-point messaging is not exposed; use shard_map with "
        "lax.ppermute for halo exchange (see pde_tpu.parallel)"
    )


def mpi_bcast(data, root: int = 0):
    """Broadcast is implicit in SPMD execution; returns data unchanged."""
    return data


def mpi_allreduce(data, operator: str = "SUM"):
    """All-reduce across processes; inside shard_map use lax.psum/pmax directly.

    In a single process the reduction over one participant is the identity.
    On multi-process (multi-host) runs an object-level allreduce would need a
    real collective, which this shim does not provide — raise rather than
    silently returning a rank-local value.
    """
    import jax

    if operator not in ("SUM", "MAX", "MIN"):
        raise ValueError(f"Unsupported operator `{operator}`")
    if jax.process_count() > 1:
        raise NotImplementedError(
            "Host-level allreduce across processes is not provided; perform "
            "reductions on device (lax.psum/pmax inside shard_map) instead"
        )
    return data
