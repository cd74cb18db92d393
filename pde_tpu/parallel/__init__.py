"""Domain decomposition over JAX device meshes (ICI-scaled SPMD execution)."""

from .boundaries import ShardedBoundaries
from .mesh import GridMesh, _get_optimal_decomposition
