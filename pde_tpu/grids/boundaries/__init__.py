"""Boundary conditions for grids.

Mini-language (mirroring the reference `pde/grids/boundaries/__init__.py`):

.. code-block:: python

    field.laplace(bc={"x": "periodic", "y-": {"value": 2}, "y+": {"derivative": -1}})

Strings: ``periodic``, ``anti-periodic``, ``dirichlet``/``value``,
``neumann``/``derivative``/``no-flux``, ``mixed``/``robin``, ``curvature``,
``auto_periodic_neumann`` (aka ``natural``), ``auto_periodic_dirichlet``.
Dicts: ``{"value": 2}``, ``{"derivative": "sin(x)"}``,
``{"type": "mixed", "value": 2, "const": 7}``, ``{"value_expression": "t * x"}``,
``{"curvature": 2}``, ``{"virtual_point": ...}``, ``{"user": ...}``.
Sides may be addressed by axis name (``"y"``), side (``"y-"``, ``"y+"``), grid
aliases (``"left"``, ``"top"``, ...), or the wildcard ``"*"``.
"""

from .axes import (
    BoundariesBase,
    BoundariesList,
    BoundariesSetter,
    set_default_bc,
)
from .axis import (
    BoundaryAxisBase,
    BoundaryPair,
    BoundaryPeriodic,
    get_boundary_axis,
)
from .local import (
    BCBase,
    BCDataError,
    CurvatureBC,
    DirichletBC,
    ExpressionBC,
    ExpressionDerivativeBC,
    ExpressionMixedBC,
    ExpressionValueBC,
    MixedBC,
    NeumannBC,
    NormalCurvatureBC,
    NormalDirichletBC,
    NormalMixedBC,
    NormalNeumannBC,
    UserBC,
    registered_boundary_condition_classes,
    registered_boundary_condition_names,
)
