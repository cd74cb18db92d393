"""PDE models ("models/" per the TPU framework layout; reference `pde/pdes/`)."""

from .allen_cahn import AllenCahnPDE
from .base import PDEBase, SDEBase
from .cahn_hilliard import CahnHilliardPDE
from .diffusion import DiffusionPDE
from .klein_gordon import KleinGordonPDE
from .kpz_interface import KPZInterfacePDE
from .kuramoto_sivashinsky import KuramotoSivashinskyPDE
from .reaction_diffusion import ReactionDiffusionPDE
from .swift_hohenberg import SwiftHohenbergPDE
from .wave import WavePDE

try:
    from .pde import PDE
except ImportError:  # pragma: no cover — during incremental bootstrap
    pass
try:
    from .laplace import solve_laplace_equation, solve_poisson_equation
except ImportError:  # pragma: no cover
    pass
