"""Explicit solver with device-mesh domain decomposition.

TPU-native replacement of the reference ``ExplicitMPISolver``
(`/root/reference/pde/solvers/explicit_mpi.py:24`): instead of MPI ranks,
scatter/gather, and a main/client controller split, the whole window loop runs
SPMD under ``shard_map`` over a :class:`jax.sharding.Mesh`, with ppermute halo
exchanges inside each rhs evaluation and pmax-synchronized adaptive time steps.

Note that *any* solver accepts a ``decomposition`` argument — this class only
provides the drop-in name for reference compatibility.
"""

from __future__ import annotations

from ..models.base import PDEBase
from .euler import EulerSolver


class ExplicitShardedSolver(EulerSolver):
    """Explicit Euler solver distributed over the device mesh."""

    name = "explicit_sharded"

    def __init__(
        self,
        pde: PDEBase,
        *,
        backend: str = "auto",
        adaptive: bool = False,
        tolerance: float = 1e-4,
        decomposition="auto",
    ):
        super().__init__(pde, backend=backend, adaptive=adaptive,
                         tolerance=tolerance, decomposition=decomposition)


class ExplicitMPISolver(ExplicitShardedSolver):
    """Compatibility alias using the reference's solver name."""

    name = "explicit_mpi"
