"""pde_tpu — a TPU-native finite-difference PDE framework.

A from-scratch re-design of py-pde (zwicker-group/py-pde) for TPU hardware:
JAX/XLA compute path with Pallas stencil kernels, `lax.scan` time loops, and
`shard_map` domain decomposition over device meshes.

Typical usage mirrors the reference README:

    import pde_tpu as pde

    grid = pde.UnitGrid([64, 64])
    state = pde.ScalarField.random_uniform(grid)
    eq = pde.DiffusionPDE(diffusivity=0.1)
    result = eq.solve(state, t_range=10)
    result.plot()
"""

__version__ = "0.1.0"

from .utils.config import Config, Parameter, config, environment  # noqa: F401
from .backends import (  # noqa: F401
    BackendBase,
    NumpyBackend,
    PallasBackend,
    XLABackend,
    get_backend,
    registered_backends,
)
from .grids import *  # noqa: F401,F403
from .grids.base import GridBase, registered_grids  # noqa: F401
from .grids.coordinates import DimensionError  # noqa: F401
from .grids.boundaries import *  # noqa: F401,F403

try:
    from .fields import *  # noqa: F401,F403
except ImportError:  # pragma: no cover — during incremental bootstrap
    pass
try:
    from .models import *  # noqa: F401,F403
except ImportError:  # pragma: no cover
    pass
try:
    from .solvers import *  # noqa: F401,F403
except ImportError:  # pragma: no cover
    pass
try:
    from .trackers import *  # noqa: F401,F403
    from .trackers.base import TransformedTrackerBase  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .storage import *  # noqa: F401,F403
except ImportError:  # pragma: no cover
    pass
try:
    from .visualization import *  # noqa: F401,F403
except ImportError:  # pragma: no cover
    pass
try:
    from .utils.expressions import ScalarExpression, TensorExpression  # noqa: F401
    from .utils.expressions_eval import evaluate  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .parallel import GridMesh  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .models.laplace import helmholtz_decomposition  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from .storage.modelrunner import ModelrunnerStorage  # noqa: F401
except ImportError:  # pragma: no cover — optional py-modelrunner dependency
    pass

# module aliases mirroring the reference package layout (`pde.pdes`,
# `pde.tools`, `pde.solvers.explicit_mpi`)
from . import models as pdes  # noqa: F401
from . import utils as tools  # noqa: F401
from .solvers import explicit_sharded as explicit_mpi  # noqa: F401
