"""Mathematical expressions parsed by sympy and lowered to JAX.

TPU-native re-design of the reference expression layer
(`/root/reference/pde/tools/expressions.py:98,454,676`): expressions are parsed
once on the host with a guarded sympy namespace and lowered via
``sympy.lambdify`` to ``jax.numpy`` functions, which XLA then fuses into the
surrounding computation.

Warning:
    Expression parsing ultimately uses :func:`eval`-like mechanisms; do not parse
    expressions from untrusted sources.
"""

from __future__ import annotations

import copy
import logging
import numbers
import re
from typing import Any, Callable, Sequence

import numpy as np
import sympy
from sympy.parsing.sympy_parser import parse_expr, standard_transformations

_logger = logging.getLogger(__name__)


_BLOCKED_NAMES = {"__builtins__", "eval", "exec", "import", "__import__", "open"}


def parse_expr_guarded(
    expression: str, symbols=None, functions=None, *, indexed: bool = False
) -> sympy.Expr:
    """Parse an expression with a guarded sympy namespace.

    Reference: `tools/expressions.py:98`.
    """
    for bad in _BLOCKED_NAMES:
        if bad in expression:
            raise ValueError(f"Forbidden token `{bad}` in expression")
    local_dict: dict[str, Any] = {}
    for sym_list in symbols or []:
        for name in [sym_list] if isinstance(sym_list, str) else sym_list:
            local_dict[name] = sympy.Symbol(name)
    if indexed:
        local_dict["IndexedBase"] = sympy.IndexedBase
    for name in functions or []:
        local_dict[name] = sympy.Function(name)
    expr = parse_expr(
        expression, local_dict=local_dict, transformations=standard_transformations
    )
    return expr


def _heaviside_jax(x, *args):
    import jax.numpy as jnp

    h0 = args[0] if args else 0.5
    return jnp.heaviside(x, h0)


def _heaviside_numpy(x, *args):
    h0 = args[0] if args else 0.5
    return np.heaviside(x, h0)


_JAX_PRINTER_MODULES = None


def _get_jax_modules():
    """Translation table for lambdify to jax.numpy (reference `jax/backend.py:691`)."""
    global _JAX_PRINTER_MODULES
    if _JAX_PRINTER_MODULES is None:
        import jax.numpy as jnp

        _JAX_PRINTER_MODULES = [
            {
                "Heaviside": _heaviside_jax,
                "DiracDelta": lambda x: jnp.zeros_like(x),
                "Max": jnp.maximum,
                "Min": jnp.minimum,
                "conjugate": jnp.conjugate,
                "im": jnp.imag,
                "re": jnp.real,
                "Abs": jnp.abs,
            },
            jnp,
        ]
    return _JAX_PRINTER_MODULES


_NUMPY_MODULES = [
    {"Heaviside": _heaviside_numpy, "DiracDelta": lambda x: np.zeros_like(x)},
    "numpy",
]


class ExpressionBase:
    """Abstract base class for handling expressions."""

    def __init__(
        self,
        expression: sympy.Basic,
        signature: Sequence[str | Sequence[str]] | None = None,
        *,
        user_funcs: dict[str, Callable] | None = None,
        consts: dict[str, Any] | None = None,
    ):
        self._sympy_expr = expression
        self.user_funcs = {} if user_funcs is None else user_funcs
        self.consts = {} if consts is None else consts
        self._check_signature(signature)

    def _check_signature(self, signature=None):
        """Validate the signature against free symbols in the expression."""
        # Indexed atoms (`name[0]`) appear in free_symbols alongside their
        # base Symbol; only plain Symbols participate in the signature
        free = {
            str(s) for s in self._sympy_expr.free_symbols if isinstance(s, sympy.Symbol)
        } - set(self.consts)
        if signature is None:
            signature = sorted(free)
        self.vars: list[str] = []
        found: set[str] = set()
        for sig in signature:
            if isinstance(sig, str):
                names = [sig]
            else:
                names = list(sig)
            canonical = names[0]
            self.vars.append(canonical)
            for name in names:
                if name in free:
                    found.add(name)
                    if name != canonical:
                        # replace alternative name by canonical one
                        self._sympy_expr = self._sympy_expr.subs(
                            sympy.Symbol(name), sympy.Symbol(canonical)
                        )
        leftover = free - found - {v for v in self.vars}
        if leftover:
            raise RuntimeError(
                f"Expression contains unexpected variables {sorted(leftover)}; "
                f"expected only {self.vars}"
            )

    @property
    def expression(self) -> str:
        return str(self._sympy_expr)

    def __repr__(self) -> str:
        return f'{self.__class__.__name__}("{self.expression}")'

    def __eq__(self, other):
        if not isinstance(other, ExpressionBase):
            return NotImplemented
        return self._sympy_expr == other._sympy_expr and self.vars == other.vars

    def __hash__(self):
        return hash((str(self._sympy_expr), tuple(self.vars)))

    @property
    def constant(self) -> bool:
        """Whether the expression is a constant."""
        return len(self._sympy_expr.free_symbols - set(map(sympy.Symbol, self.consts))) == 0

    @property
    def depends_on(self) -> set[str]:
        return {str(s) for s in self._sympy_expr.free_symbols}

    def depends_on_variable(self, variable: str) -> bool:
        return variable in self.depends_on

    @property
    def complex(self) -> bool:
        """Whether the expression contains the imaginary unit."""
        return sympy.I in self._sympy_expr.atoms()

    @property
    def rank(self) -> int:
        return 0

    def _get_function(self, single_arg: bool = False, backend: str = "jax") -> Callable:
        """Lambdify the expression for the given backend ('jax' or 'numpy')."""
        modules: Any
        # user functions FIRST so they shadow same-named numpy/jnp attributes
        # (e.g. a user function `double` vs the jnp.double dtype constructor)
        if backend == "jax":
            modules = [self.user_funcs] + _get_jax_modules()
        elif backend in ("numpy", "numba"):
            modules = [self.user_funcs] + _NUMPY_MODULES
        else:
            raise ValueError(f"Unknown backend `{backend}`")
        expr = self._sympy_expr
        # consts referenced as `name[idx]` (IndexedBase) cannot be substituted
        # into the sympy tree; bind them as extra lambdify arguments instead
        indexed_names = {
            str(a.base.label) for a in expr.atoms(sympy.Indexed)
        } & set(self.consts)
        if self.consts:
            expr = expr.subs(
                {
                    sympy.Symbol(k): v
                    for k, v in self.consts.items()
                    if k not in indexed_names
                }
            )
        variables = [sympy.Symbol(v) for v in self.vars]
        extra_args = [sympy.IndexedBase(name) for name in sorted(indexed_names)]
        extra_vals = [self.consts[name] for name in sorted(indexed_names)]
        func = sympy.lambdify(variables + extra_args, expr, modules=modules)
        if extra_vals:
            inner = func
            func = lambda *args: inner(*args, *extra_vals)  # noqa: E731
        if single_arg:
            return lambda arr: func(*arr)
        return func

    def get_compiled(self, single_arg: bool = False) -> Callable:
        """Return a jitted version of the expression function."""
        import jax

        return jax.jit(self._get_function(single_arg=single_arg, backend="jax"))

    def __call__(self, *args, **kwargs):
        """Evaluate the expression on host (numpy) data."""
        func = self._get_function(backend="numpy")
        return func(*args, **kwargs)


class ScalarExpression(ExpressionBase):
    """Describes a scalar-valued mathematical expression.

    Reference: `tools/expressions.py:454`.
    """

    shape: tuple[int, ...] = ()

    def __init__(
        self,
        expression: float | str | sympy.Basic | ScalarExpression = 0,
        signature=None,
        *,
        user_funcs=None,
        consts=None,
        explicit_symbols=None,
        allow_indexed: bool = False,
    ):
        self.allow_indexed = allow_indexed
        if isinstance(expression, ScalarExpression):
            sympy_expr = copy.copy(expression._sympy_expr)
            signature = signature or expression.vars
            user_funcs = {**expression.user_funcs, **(user_funcs or {})}
        elif isinstance(expression, sympy.Basic):
            sympy_expr = expression
        elif callable(expression):
            raise TypeError("Expressions must be strings or numbers, not functions")
        elif isinstance(expression, numbers.Number):
            sympy_expr = sympy.sympify(expression)
        elif isinstance(expression, str):
            functions = set(user_funcs or {})
            if allow_indexed:
                # `name[idx]` denotes indexing a (constant) array, e.g. the
                # `cartesian[i]` coordinates (reference `expressions.py:607`)
                expression = re.sub(
                    r"\b(\w+)\s*(\[\w+\])", r"IndexedBase(\1)\2", expression
                )
            sympy_expr = parse_expr_guarded(
                expression,
                symbols=[signature or [], explicit_symbols or [], list(consts or {})],
                functions=functions,
                indexed=allow_indexed,
            )
        elif isinstance(expression, np.ndarray) and expression.ndim == 0:
            sympy_expr = sympy.sympify(float(expression))
        else:
            raise TypeError(f"Cannot interpret expression of type {type(expression)}")
        super().__init__(sympy_expr, signature, user_funcs=user_funcs, consts=consts)

    def copy(self) -> ScalarExpression:
        return ScalarExpression(
            self, signature=self.vars, user_funcs=self.user_funcs, consts=self.consts
        )

    @property
    def value(self) -> float:
        """The constant value of the expression (if it is constant)."""
        if not self.constant:
            raise TypeError("Only constant expressions have a value")
        value = self._sympy_expr.subs(
            {sympy.Symbol(k): v for k, v in self.consts.items()}
        )
        return complex(value) if self.complex else float(value)

    @property
    def is_zero(self) -> bool:
        return self.constant and self.value == 0

    def __bool__(self) -> bool:
        return not self.is_zero

    def differentiate(self, var: str) -> ScalarExpression:
        """Return the derivative with respect to `var`."""
        if self.constant:
            return ScalarExpression(0, signature=self.vars)
        return ScalarExpression(
            self._sympy_expr.diff(sympy.Symbol(var)),
            signature=self.vars,
            user_funcs=self.user_funcs,
            consts=self.consts,
        )

    @property
    def derivatives(self) -> TensorExpression:
        """Gradient with respect to all variables."""
        if self.constant:
            derivs = sympy.Array([0] * len(self.vars))
        else:
            derivs = sympy.Array(
                [self._sympy_expr.diff(sympy.Symbol(v)) for v in self.vars]
            )
        return TensorExpression(derivs, signature=self.vars, user_funcs=self.user_funcs)


class TensorExpression(ExpressionBase):
    """Describes a tensor-valued mathematical expression.

    Reference: `tools/expressions.py:676`.
    """

    def __init__(self, expression, signature=None, *, user_funcs=None, consts=None):
        if isinstance(expression, TensorExpression):
            sympy_expr = expression._sympy_expr
            signature = signature or expression.vars
            user_funcs = {**expression.user_funcs, **(user_funcs or {})}
        elif isinstance(expression, sympy.Array):
            sympy_expr = expression
        elif isinstance(expression, str):
            # strings like "[x, 2*x]" are parsed elementwise
            parsed = parse_expr_guarded(
                expression,
                symbols=[signature or [], list(consts or {})],
                functions=set(user_funcs or {}),
            )
            sympy_expr = sympy.Array(parsed)
        else:
            # nested sequence of expressions / numbers
            def _build(obj):
                if isinstance(obj, (list, tuple)):
                    return [_build(o) for o in obj]
                if isinstance(obj, str):
                    return parse_expr_guarded(
                        obj,
                        symbols=[signature or [], list(consts or {})],
                        functions=set(user_funcs or {}),
                    )
                return sympy.sympify(obj)

            sympy_expr = sympy.Array(_build(expression))
        super().__init__(sympy_expr, signature, user_funcs=user_funcs, consts=consts)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self._sympy_expr.shape)

    @property
    def rank(self) -> int:
        return len(self.shape)

    def __getitem__(self, index):
        expr = self._sympy_expr[index]
        if isinstance(expr, sympy.Array):
            return TensorExpression(expr, signature=self.vars, user_funcs=self.user_funcs)
        return ScalarExpression(expr, signature=self.vars, user_funcs=self.user_funcs)

    @property
    def constant(self) -> bool:
        return all(
            len(e.free_symbols) == 0 for e in np.asarray(self._sympy_expr).flat
        )

    @property
    def value(self):
        if not self.constant:
            raise TypeError("Only constant expressions have a value")
        return np.array(self._sympy_expr, dtype=float)

    def differentiate(self, var: str) -> TensorExpression:
        return TensorExpression(
            self._sympy_expr.diff(sympy.Symbol(var)),
            signature=self.vars,
            user_funcs=self.user_funcs,
        )

    @property
    def derivatives(self) -> TensorExpression:
        derivs = sympy.derive_by_array(
            self._sympy_expr, [sympy.Symbol(v) for v in self.vars]
        )
        return TensorExpression(derivs, signature=self.vars, user_funcs=self.user_funcs)

    def _get_function(self, single_arg: bool = False, backend: str = "jax"):
        """Lambdify returning a stacked array."""
        if backend == "jax":
            import jax.numpy as xnp

            modules = _get_jax_modules() + [self.user_funcs]
        else:
            import numpy as xnp  # type: ignore[no-redef]

            modules = _NUMPY_MODULES + [self.user_funcs]
        variables = [sympy.Symbol(v) for v in self.vars]
        exprs = np.asarray(self._sympy_expr)
        shape = exprs.shape
        funcs = [
            sympy.lambdify(variables, e, modules=modules) for e in exprs.flat
        ]

        def func(*args):
            values = [f(*args) for f in funcs]
            values = xnp.broadcast_arrays(*[xnp.asarray(v) for v in values])
            return xnp.stack(values).reshape(shape + values[0].shape)

        if single_arg:
            return lambda arr: func(*arr)
        return func
