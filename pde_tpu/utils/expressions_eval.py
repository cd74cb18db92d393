"""Evaluate expressions involving fields and differential operators.

TPU-native equivalent of `/root/reference/pde/tools/expressions.py:866`
(``evaluate``): the expression is parsed once, operators resolve against the
grid registry, and evaluation happens as one fused XLA computation.
"""

from __future__ import annotations

import numbers
import re
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np
import sympy

from ..fields.datafield_base import DataFieldBase
from ..fields.scalar import ScalarField
from ..fields.tensorial import Tensor2Field
from ..fields.vectorial import VectorField


def evaluate(
    expression: str,
    fields: dict[str, DataFieldBase],
    *,
    bc="auto_periodic_neumann",
    bc_ops: dict[str, Any] | None = None,
    user_funcs: dict[str, Callable] | None = None,
    consts: dict[str, Any] | None = None,
    label: str | None = None,
) -> DataFieldBase:
    """Evaluate an expression of fields, supporting differential operators.

    Example: ``evaluate("laplace(a * b)", {"a": a, "b": b})``.
    """
    from sympy.core.function import AppliedUndef

    from ..models.pde import _EXPRESSION_REPLACEMENT
    from .expressions import ScalarExpression, _get_jax_modules

    if not fields:
        raise ValueError("Need at least one field to evaluate an expression")
    grids = {f.grid for f in fields.values()}
    if len(grids) > 1:
        raise ValueError("All fields must be defined on the same grid")
    grid = next(iter(grids))
    user_funcs = dict(user_funcs or {})
    consts = dict(consts or {})

    for search, repl in _EXPRESSION_REPLACEMENT.items():
        expression = re.sub(search, repl, expression)
    expr = ScalarExpression(
        expression,
        signature=None,
        user_funcs=user_funcs,
        consts=dict.fromkeys(consts, 0),
        explicit_symbols=list(fields) + list(grid.axes) + ["t"],
    )

    operators = {
        func.__class__.__name__
        for func in expr._sympy_expr.atoms(AppliedUndef)
        if func.__class__.__name__ not in user_funcs
    }

    ops: dict[str, Callable] = {}
    bc_ops = dict(bc_ops or {})
    for func in operators:
        if func in ("dot", "inner"):
            dot = VectorField(grid).make_dot_operator()
            ops["dot"] = dot
            ops["inner"] = dot
        elif func == "outer":
            ops["outer"] = VectorField(grid).make_outer_prod_operator()
        elif func == "integral":
            ops["integral"] = lambda arr: grid.integrate(arr)
        else:
            op_bc = bc_ops.get(func, bc)
            op = grid.make_operator(func, bc=op_bc, jit=False)
            ops[func] = (lambda _op: lambda arr: _op(arr, 0.0, None))(op)

    signature = list(fields) + list(grid.axes)
    scalar_consts, const_names, const_args = {}, [], []
    for name, value in consts.items():
        if isinstance(value, DataFieldBase):
            const_names.append(name)
            const_args.append(jnp.asarray(value.data))
        elif np.isscalar(value) or isinstance(value, numbers.Number):
            scalar_consts[name] = value
        else:
            const_names.append(name)
            const_args.append(jnp.asarray(value))
    signature += const_names

    sympy_expr = expr._sympy_expr
    if scalar_consts:
        sympy_expr = sympy_expr.subs(
            {sympy.Symbol(k): v for k, v in scalar_consts.items()}
        )
    free = {str(s) for s in sympy_expr.free_symbols}
    unknown = free - set(signature)
    if unknown:
        raise RuntimeError(f"Undefined variables in expression: {sorted(unknown)}")

    modules = [ops, user_funcs, *_get_jax_modules()]
    variables = [sympy.Symbol(v) for v in signature]
    func = sympy.lambdify(variables, sympy_expr, modules=modules)

    coords = tuple(jnp.asarray(grid.cell_coords[..., i]) for i in range(grid.num_axes))
    args = [jnp.asarray(f.data) for f in fields.values()]
    result = jnp.asarray(func(*args, *coords, *const_args))

    # infer the tensorial rank of the result from its shape
    shape = tuple(result.shape)
    if shape == tuple(grid.shape) or result.ndim == 0:
        cls: type[DataFieldBase] = ScalarField
        result = jnp.broadcast_to(result, grid.shape)
    elif shape == (grid.dim,) + tuple(grid.shape):
        cls = VectorField
    elif shape == (grid.dim, grid.dim) + tuple(grid.shape):
        cls = Tensor2Field
    else:
        raise RuntimeError(f"Cannot interpret result shape {shape}")
    return cls(grid, data=result, label=label)
