"""Differential operators lowered to XLA/Pallas.

Operators are registered per grid class via ``GridBase.register_operator`` and
retrieved through ``grid.make_operator(name, bc)``, mirroring the reference
operator registry (`/root/reference/pde/backends/base.py:257`).
"""

from . import cartesian  # noqa: F401 — registers Cartesian operators
from .common import make_derivative, make_derivative2, wrap_with_bcs

try:  # curvilinear operators (registered on import)
    from . import cylindrical, polar, spherical  # noqa: F401
except ImportError:  # pragma: no cover — during incremental bootstrap
    pass

try:
    from . import poisson  # noqa: F401 — registers poisson_solver operators
except ImportError:  # pragma: no cover
    pass

__all__ = ["make_derivative", "make_derivative2", "wrap_with_bcs"]
