"""PDEs defined by mathematical expressions — the flagship user interface.

TPU-native re-design of `/root/reference/pde/pdes/pde.py:64`: user expressions
like ``PDE({"c": "laplace(c**3 - c - laplace(c))"})`` are sympy-parsed once on
the host, differential operators are resolved against the grid's operator
registry with per-(variable, operator) boundary-condition routing, and the
whole right hand side lowers to ONE jitted function per field — XLA fuses the
stencils, ghost-cell updates, and pointwise math into a single kernel.
"""

from __future__ import annotations

import keyword
import numbers
import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import sympy

from ..fields.base import FieldBase
from ..fields.collection import FieldCollection
from ..fields.datafield_base import DataFieldBase
from ..fields.vectorial import VectorField
from ..grids.base import cell_coords_traced, local_slice_traced
from ..grids.boundaries import set_default_bc
from .base import SDEBase

# Shorthand notations expanded before parsing (reference `pde.py:47-53`)
_EXPRESSION_REPLACEMENT: dict[str, str] = {
    r"\|\s*∇\s*(\w+)\s*\|(²|\*\*2)": r"gradient_squared(\1)",
    r"∇(²|\*\*2)\s*(\w+)": r"laplace(\2)",
    r"∇(²|\*\*2)\s*\(": r"laplace(",
    r"²": r"**2",
    r"³": r"**3",
    # normalize to the sympy spelling so it is not mistaken for an operator
    r"\bheaviside\(": r"Heaviside(",
}

# How common operators map to Fourier space (reference `pde.py:56-60`)
_OPERATOR_FOURIER_MAPPING = {
    "laplace": "-wave_vector**2 * argument",
    "gradient": "I * wave_vector * argument",
    "divergence": "I * wave_vector * argument",
}

_SPECIAL_OPERATORS = {"dot", "inner", "outer", "integral"}


def _wrap_vector_planes(window, slots):
    """Adapt a plane-list fused window to stacked rank-1 state leaves.

    The multi-field kernels operate on flat lists of scalar planes; state
    leaves keep the reference's layout (a VectorField leaf is one
    ``(dim, *grid.shape)`` array). Splits vector leaves into component
    planes on the way in and restacks on the way out, preserving the
    window's per-step side-input protocol attributes.
    """

    def wrapped(datas, *rest):
        planes = []
        for data, slot in zip(datas, slots, strict=True):
            if isinstance(slot, tuple):
                planes.extend(data[j] for j in range(len(slot)))
            else:
                planes.append(data)
        out = window(planes, *rest)
        result, pos = [], 0
        for slot in slots:
            if isinstance(slot, tuple):
                result.append(jnp.stack(list(out[pos:pos + len(slot)])))
                pos += len(slot)
            else:
                result.append(out[pos])
                pos += 1
        return result

    for attr in ("t_specs", "xt_entries", "needs_t"):
        if hasattr(window, attr):
            setattr(wrapped, attr, getattr(window, attr))
    return wrapped


class PDE(SDEBase):
    """A partial differential equation defined by expression strings."""

    default_bc = "auto_periodic_neumann"

    def __init__(
        self,
        rhs: dict[str, str],
        *,
        bc=None,
        bc_ops: dict[str, Any] | None = None,
        post_step_hook: Callable | None = None,
        user_funcs: dict[str, Callable] | None = None,
        consts: dict[str, Any] | None = None,
        noise=0,
        noise_interpretation: str = "ito",
        rng: np.random.Generator | None = None,
    ):
        from sympy.core.function import AppliedUndef

        from ..utils.expressions import ScalarExpression

        if isinstance(noise, dict):
            noise_arr = np.array([noise.get(var, 0) for var in rhs])
        else:
            noise_arr = noise
        if hasattr(noise_arr, "__iter__") and len(noise_arr) != len(rhs):
            raise ValueError("Number of noise strengths does not match field count")
        super().__init__(noise=noise_arr, noise_interpretation=noise_interpretation, rng=rng)

        rhs = dict(rhs)
        for name in rhs:
            self._check_identifier(name)
        self.consts = dict(consts or {})
        self.user_funcs = dict(user_funcs or {})

        self._rhs_expr: dict[str, ScalarExpression] = {}
        self._operators: dict[str, set[str]] = {}
        explicit_time_dependence = False
        complex_valued = False
        for var, rhs_item in rhs.items():
            if isinstance(rhs_item, str):
                for search, repl in _EXPRESSION_REPLACEMENT.items():
                    rhs_item = re.sub(search, repl, rhs_item)
            expr = ScalarExpression(
                rhs_item,
                signature=None,
                user_funcs=self.user_funcs,
                consts=dict.fromkeys(self.consts, 0),
                explicit_symbols=list(rhs.keys()) + ["t"],
            )
            if expr.depends_on_variable("t"):
                explicit_time_dependence = True
            if expr.complex:
                complex_valued = True
            self._operators[var] = {
                func.__class__.__name__
                for func in expr._sympy_expr.atoms(AppliedUndef)
                if func.__class__.__name__ not in self.user_funcs
            }
            self._rhs_expr[var] = expr

        self.rhs = rhs
        self.variables = tuple(rhs.keys())
        self.explicit_time_dependence = explicit_time_dependence
        self.complex_valued = complex_valued
        self.post_step_hook = post_step_hook

        # boundary condition routing table "var:op" -> bc (reference `pde.py:231-264`)
        bc = set_default_bc(bc, self.default_bc)
        if bc_ops is None:
            bcs = {"*:*": bc}
        elif isinstance(bc_ops, dict):
            bcs = dict(bc_ops)
            bcs["*:*"] = bc
        else:
            raise TypeError("`bc_ops` must be a dictionary")
        self.bcs: dict[str, Any] = {}
        for key_str, value in bcs.items():
            parts = re.split(r"\.|:", key_str)
            if len(parts) == 1:
                key = f"{self.variables[0]}:{key_str}" if self.variables else key_str
            elif len(parts) == 2:
                key = ":".join(parts)
            else:
                raise ValueError(f'Cannot parse boundary condition "{key_str}"')
            self.bcs[key] = value

        self.diagnostics["pde"] = {
            "variables": list(self.variables),
            "constants": sorted(self.consts),
            "explicit_time_dependence": explicit_time_dependence,
            "complex_valued_rhs": complex_valued,
            "operators": sorted(set().union(*self._operators.values()) if self._operators else set()),
            "bcs_used": set(),
        }
        self._cache: dict[Any, dict[str, Any]] = {}

    @staticmethod
    def _check_identifier(name: str) -> None:
        if not name.isidentifier():
            raise ValueError(f"`{name}` is not a valid field name")
        if keyword.iskeyword(name):
            raise ValueError(f"`{name}` is a keyword and cannot be a field name")
        if name == "t":
            raise ValueError("Cannot name a field `t` since it denotes time")

    @property
    def expressions(self) -> dict[str, str]:
        """The (expanded) expressions of the PDE."""
        return {k: v.expression for k, v in self._rhs_expr.items()}

    @property
    def expression(self) -> str:
        return "; ".join(f"d{k}/dt = {v}" for k, v in self.expressions.items())

    # -- boundary condition routing --------------------------------------------------------
    def _resolve_bc(self, var: str, func: str):
        for bc_key, bc in self.bcs.items():
            bc_var, bc_func = bc_key.split(":")
            if (bc_var == var or bc_var == "*") and (bc_func == func or bc_func == "*"):
                self.diagnostics["pde"]["bcs_used"].add(bc_key)
                return bc
        raise RuntimeError(
            f"Could not find a boundary condition for operator `{func}` in the "
            f"equation for `{var}`"
        )

    # -- compilation -------------------------------------------------------------------------
    def _compile_rhs_single(self, var: str, ops: dict[str, Callable], state: FieldBase):
        """Compile the rhs function for one variable (reference `pde.py:401`)."""
        from sympy.core.function import UndefinedFunction

        from ..utils.expressions import _get_jax_modules

        expr = self._rhs_expr[var].copy()
        grid = state.grid

        # resolve differential operators with their boundary conditions
        for func in self._operators[var]:
            if func in ops:
                continue
            bc = self._resolve_bc(var, func)
            op = grid.make_operator(func, bc=bc, jit=False)
            # bind: operator(data, t) with user args reserved for BCs
            ops[func] = (lambda _op: lambda arr, t: _op(arr, t, None))(op)

        # rewrite `f(args)` -> `f(args, t)` for differential operators, so
        # time-dependent boundary conditions receive the current time
        t_sym = sympy.Symbol("t")
        for func in self._operators[var] - _SPECIAL_OPERATORS:

            def add_t(application, _name=func):
                return application.func(*application.args, t_sym)

            expr._sympy_expr = expr._sympy_expr.replace(
                lambda e, _name=func: (
                    isinstance(e.func, UndefinedFunction)
                    and e.func.__name__ == _name
                    and not (len(e.args) > 1 and e.args[-1] == t_sym)
                ),
                add_t,
            )

        # build the function signature
        signature: list[str] = list(self.variables) + ["t"]
        needs_coords = any(expr.depends_on_variable(c) for c in grid.axes)
        if needs_coords:
            signature += list(grid.axes)

        # separate scalar and field-valued constants
        scalar_consts = {}
        const_args: list = []
        const_names: list[str] = []
        for name, value in self.consts.items():
            if isinstance(value, DataFieldBase):
                # on a decomposed subgrid template, field constants live on
                # the GLOBAL grid and are sliced per shard in rhs_func
                mesh = getattr(grid, "_mesh", None)
                value.grid.assert_grid_compatible(
                    mesh.basegrid if mesh is not None else grid
                )
                const_names.append(name)
                const_args.append(jnp.asarray(value.data))
            elif np.isscalar(value) or isinstance(value, numbers.Number):
                scalar_consts[name] = value
            elif isinstance(value, np.ndarray):
                const_names.append(name)
                const_args.append(jnp.asarray(value))
            else:
                raise TypeError(f"Constant `{name}` has unsupported type {type(value)}")
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

        modules = [dict(ops), self.user_funcs, *_get_jax_modules()]
        variables = [sympy.Symbol(v) for v in signature]
        func_inner = sympy.lambdify(variables, sympy_expr, modules=modules)
        var_index = list(self.variables).index(var)

        def rhs_func(field_data: tuple, t):
            # coordinate and field-constant arrays are resolved per trace so
            # decomposed shards receive their own slice of the global data
            # (see grids.base.cell_coords_traced / local_slice_traced)
            coord_args = cell_coords_traced(grid) if needs_coords else ()
            local_consts = [
                local_slice_traced(grid, a, rank=a.ndim - grid.num_axes)
                for a in const_args
            ]
            result = jnp.asarray(
                func_inner(*field_data, t, *coord_args, *local_consts)
            )
            # constant expressions (e.g. "0") must still fill the field shape
            return jnp.broadcast_to(result, jnp.shape(field_data[var_index]))

        return rhs_func

    def _prepare_cache(self, state: FieldBase) -> dict[str, Any]:
        """Compile all rhs functions for a given state (cached).

        Reference: `pde.py:501-634`.
        """
        key = (state.grid, type(state).__name__, len(state) if isinstance(state, FieldCollection) else 1)
        cache = self._cache.get(key)
        if cache is not None:
            return cache

        num_fields = len(self.variables)
        if isinstance(state, FieldCollection):
            if num_fields != len(state):
                raise ValueError(
                    f"Expected {num_fields} fields in state, got {len(state)}"
                )
        elif isinstance(state, DataFieldBase):
            if num_fields != 1:
                raise ValueError(f"Expected {num_fields} fields in state, got one")
        else:
            raise TypeError(f"Unknown state class {state.__class__.__name__}")

        if set(self.rhs) & set(state.grid.axes):
            raise ValueError("Field names cannot coincide with grid axes")

        # special operators (reference `pde.py:574-594`)
        operators = set().union(*self._operators.values()) if self._operators else set()
        ops_general: dict[str, Callable] = {}
        if "dot" in operators or "inner" in operators:
            dot = VectorField(state.grid).make_dot_operator()
            ops_general["dot"] = dot
            ops_general["inner"] = dot
        if "outer" in operators:
            ops_general["outer"] = VectorField(state.grid).make_outer_prod_operator()
        if "integral" in operators:
            grid = state.grid
            ops_general["integral"] = lambda arr: grid.integrate(arr)

        rhs_funcs = [
            self._compile_rhs_single(var, ops_general.copy(), state)
            for var in self.variables
        ]
        cache = {"rhs_funcs": rhs_funcs}
        self._cache[key] = cache
        return cache

    # -- evaluation --------------------------------------------------------------------------------
    def make_pde_rhs(self, state: FieldBase, backend: str = "jax") -> Callable:
        """Fused rhs on raw data leaves: ``rhs(leaves, t) -> leaves``."""
        cache = self._prepare_cache(state)
        rhs_funcs = cache["rhs_funcs"]

        def rhs(leaves, t):
            data = tuple(leaves)
            return [f(data, t) for f in rhs_funcs]

        return rhs

    def evolution_rate(self, state: FieldBase, t: float = 0.0) -> FieldBase:
        cache = self._prepare_cache(state)
        rhs_funcs = cache["rhs_funcs"]
        if isinstance(state, DataFieldBase):
            data = rhs_funcs[0]((state.data,), t)
            return state.__class__(state.grid, data=data, label="evolution rate")
        data_tuple = tuple(f.data for f in state)  # type: ignore[union-attr]
        fields = []
        for i, field in enumerate(state):  # type: ignore[union-attr]
            rate = rhs_funcs[i](data_tuple, t)
            fields.append(field.__class__(field.grid, data=rate, label=field.label))
        return FieldCollection(fields)

    # pointwise sympy functions the stencil lowering knows how to emit
    _POINTWISE_FUNCS = {
        "sin": "sin", "cos": "cos", "tan": "tan", "exp": "exp", "log": "log",
        "sqrt": "sqrt", "tanh": "tanh", "sinh": "sinh", "cosh": "cosh",
        "Abs": "abs",
    }

    def _lower_stencil_expr(
        self, expr, var_map, helpers, get_bc=None, vector_components=None
    ):
        """Recursively lower a sympy rhs to an in-VMEM evaluator.

        ``var_map`` maps field symbols to indices into the work list — an
        int for scalar fields, a tuple of plane indices for rank-1 states
        (each component is one work plane). Returns ``(fn, depth)`` where
        ``fn(works) -> array`` produces the value on the work arrays shrunk
        by `depth` rows per side. Supported nodes: field symbols, numbers,
        Add/Mul/Pow, common pointwise functions, and the stencil operators
        ``laplace`` / ``vector_laplace`` / ``gradient_squared`` /
        ``gradient`` / ``divergence`` / ``dot`` (arbitrarily composed —
        each derivative application consumes one halo row per side; vector
        intermediates are component tuples).

        With ``vector_components`` set the rhs belongs to a rank-1
        variable: ``fn`` returns a component tuple of that length (a
        scalar-valued rhs is replicated across components, matching the
        XLA path's broadcast to the field shape).
        """
        from sympy.core.function import AppliedUndef

        if get_bc is None:
            get_bc = lambda op_name: None

        # shrink semantics are helper-defined: roll-based kernels consume
        # rows only, halo-extended (column-decomposed) kernels both dims
        helpers_trim = getattr(helpers, "trim", None)

        def trim(value, amount):
            if helpers_trim is not None:
                return helpers_trim(value, amount)
            if isinstance(value, tuple):
                return tuple(trim(v, amount) for v in value)
            if amount == 0 or jnp.ndim(value) == 0:
                return value
            return value[amount:-amount, :]

        def lower(e):
            """Returns (fn, depth, is_vector)."""
            if e in var_map:
                idx = var_map[e]
                if isinstance(idx, tuple):  # rank-1 state: component planes
                    return (
                        (lambda ws, _i=idx: tuple(ws[j] for j in _i)),
                        0,
                        True,
                    )
                return (lambda ws, _i=idx: ws[_i]), 0, False
            if e.is_Number:
                if not e.is_real:
                    raise NotImplementedError("complex coefficients unsupported")
                value = float(e)
                return (lambda ws: value), 0, False
            if isinstance(e, AppliedUndef):
                name = e.func.__name__
                if name == "laplace" and len(e.args) == 1:
                    fn, d, vec = lower(e.args[0])
                    if vec:
                        raise NotImplementedError(
                            "`laplace` takes a scalar; use `vector_laplace` "
                            "for rank-1 arguments (reference naming)"
                        )
                    bc = get_bc("laplace")
                    return (lambda ws: helpers.lap(fn(ws), bc=bc)), d + 1, False
                if name == "vector_laplace" and len(e.args) == 1:
                    # component-wise on Cartesian grids (the only grids the
                    # vector gate admits; curvilinear vector Laplacians
                    # carry coupling terms the helpers do not model)
                    fn, d, vec = lower(e.args[0])
                    if not vec:
                        raise NotImplementedError(
                            "`vector_laplace` needs a vector argument"
                        )
                    bc = get_bc("vector_laplace")

                    def vlap_fn(ws, _fn=fn, _bc=bc):
                        return tuple(helpers.lap(c, bc=_bc) for c in _fn(ws))

                    return vlap_fn, d + 1, True
                if name == "gradient_squared" and len(e.args) == 1:
                    fn, d, vec = lower(e.args[0])
                    if vec:
                        raise NotImplementedError("gradient_squared of vector")
                    bc = get_bc("gradient_squared")
                    return (
                        (lambda ws: helpers.gradient_squared(fn(ws), bc=bc)),
                        d + 1,
                        False,
                    )
                if name == "gradient" and len(e.args) == 1:
                    fn, d, vec = lower(e.args[0])
                    if vec:
                        raise NotImplementedError("gradient of vector unsupported")
                    bc = get_bc("gradient")
                    derivs = helpers.derivatives  # one per grid axis

                    def grad_fn(ws, _fn=fn, _bc=bc, _derivs=derivs):
                        value = _fn(ws)
                        return tuple(dv(value, bc=_bc) for dv in _derivs)

                    return grad_fn, d + 1, True
                if name == "divergence" and len(e.args) == 1:
                    fn, d, vec = lower(e.args[0])
                    if not vec:
                        raise NotImplementedError("divergence needs a vector")
                    bc = get_bc("divergence")
                    # helpers may model coordinate terms beyond the plain
                    # derivative sum (cylindrical v_r/r); fall back to the
                    # generic sum where they don't (3D, probe)
                    div_impl = getattr(helpers, "divergence", None)
                    if div_impl is not None:
                        return (
                            (lambda ws, _fn=fn, _bc=bc: div_impl(_fn(ws), bc=_bc)),
                            d + 1,
                            False,
                        )
                    derivs = helpers.derivatives

                    def div_fn(ws, _fn=fn, _bc=bc, _derivs=derivs):
                        comps = _fn(ws)
                        total = None
                        for dv, comp in zip(_derivs, comps, strict=True):
                            term = dv(comp, bc=_bc)
                            total = term if total is None else total + term
                        return total

                    return div_fn, d + 1, False
                if name in ("dot", "inner") and len(e.args) == 2:
                    fa, da, va = lower(e.args[0])
                    fb, db, vb = lower(e.args[1])
                    if not (va and vb):
                        raise NotImplementedError("dot needs two vectors")
                    depth = max(da, db)

                    def dot_fn(ws, _fa=fa, _fb=fb, _ea=depth - da, _eb=depth - db):
                        avs = trim(_fa(ws), _ea)
                        bvs = trim(_fb(ws), _eb)
                        total = None
                        for av, bv in zip(avs, bvs, strict=True):
                            term = av * bv
                            total = term if total is None else total + term
                        return total

                    return dot_fn, depth, False
                raise NotImplementedError(f"operator `{name}` has no stencil lowering")
            if isinstance(e, (sympy.Add, sympy.Mul)):
                parts = [lower(a) for a in e.args]
                depth = max(d for _, d, _v in parts)
                n_vec = sum(v for _, _d, v in parts)
                fns = [(fn, depth - d, v) for fn, d, v in parts]
                if isinstance(e, sympy.Add):
                    if n_vec not in (0, len(parts)):
                        raise NotImplementedError("cannot add scalar and vector")

                    def combined(ws, _fns=fns, _vec=n_vec > 0):
                        total = None
                        for fn, extra, _v in _fns:
                            value = trim(fn(ws), extra)
                            if total is None:
                                total = value
                            elif _vec:
                                total = tuple(t + v for t, v in zip(total, value))
                            else:
                                total = total + value
                        return total

                    return combined, depth, n_vec > 0
                if n_vec > 1:
                    raise NotImplementedError("product of vectors (use dot)")

                def combined(ws, _fns=fns):
                    total = None
                    vec_value = None
                    for fn, extra, v in _fns:
                        value = trim(fn(ws), extra)
                        if v:
                            vec_value = value
                        elif total is None:
                            total = value
                        else:
                            total = total * value
                    if vec_value is not None:
                        if total is None:
                            return vec_value
                        return tuple(total * c for c in vec_value)
                    return total

                return combined, depth, n_vec > 0
            if isinstance(e, sympy.Pow):
                base_fn, d, vec = lower(e.args[0])
                if vec:
                    raise NotImplementedError("power of a vector")
                if not e.args[1].is_Number or not e.args[1].is_real:
                    raise NotImplementedError("unsupported exponent")
                exponent = float(e.args[1])
                if exponent == int(exponent) and 0 < exponent <= 4:
                    n = int(exponent)

                    def powered(ws, _fn=base_fn, _n=n):
                        value = _fn(ws)
                        result = value
                        for _ in range(_n - 1):
                            result = result * value
                        return result

                    return powered, d, False
                return (lambda ws: base_fn(ws) ** exponent), d, False
            if isinstance(e, sympy.Function) and type(e).__name__ in self._POINTWISE_FUNCS:
                fn, d, vec = lower(e.args[0])
                if vec:
                    raise NotImplementedError("pointwise function of a vector")
                jfn = getattr(jnp, self._POINTWISE_FUNCS[type(e).__name__])
                return (lambda ws: jfn(fn(ws))), d, False
            raise NotImplementedError(f"no stencil lowering for `{e}`")

        fn, depth, vec = lower(expr)
        if vector_components is None:
            if vec:
                raise NotImplementedError("rhs must be a scalar expression")
            return fn, depth
        if vec:
            return fn, depth
        # scalar rhs for a vector variable (e.g. "0"): replicate across
        # components, matching the XLA path's broadcast to the field shape
        return (
            lambda ws, _fn=fn, _n=vector_components: (_fn(ws),) * _n
        ), depth

    def _sde_kernel_noise_spec(self, grid, dt: float, interpret: bool):
        """Spec for in-kernel hardware-PRNG noise in the fused SDE window,
        or None when the external (bit-reproducible XLA threefry) staging
        must be used.

        Active when config ``sde.kernel_noise`` is ``"on"``, or ``"auto"``
        (default) with a cheap weak-scheme ``sde.increment_dist`` — exact
        Gaussian increments stay on the XLA stream because in-kernel
        Box-Muller measured slower than the XLA path (docs/BENCHMARKS.md).
        The increment scale ``sqrt(dt * var / cell_volume)`` replicates the
        unfused stepper's cell-volume-scaled variance
        (`models/base.py make_sde_noise_step`; reference
        `/root/reference/pde/solvers/euler.py:66-147`).
        """
        from ..grids.cartesian import CartesianGrid
        from ..utils.config import config

        mode = str(config["sde.kernel_noise"])
        dist = str(config["sde.increment_dist"])
        if interpret or mode == "off" or np.ndim(self.noise) > 0:
            return None
        if mode == "auto" and dist == "normal":
            return None
        if not isinstance(grid, CartesianGrid) or grid.num_axes != 2:
            return None
        var = float(self.noise)
        cell_vol = float(np.prod(grid.discretization))
        return {"dist": dist, "scale": float(np.sqrt(dt * var / cell_vol))}

    def make_fused_euler_window(self, state: FieldBase, dt: float, mesh=None):
        """Emit a fused Pallas temporal-blocking kernel for the rhs.

        With ``mesh`` given the window operates on per-shard leaves inside
        ``shard_map`` (fully periodic grids decomposed along the row axis;
        halos move via ppermute once per kernel call).

        The expression compiler lowers arbitrary compositions of ``laplace``,
        ``vector_laplace``, ``gradient``, ``divergence``, ``dot``, and
        ``gradient_squared`` with pointwise math (covers diffusion, KPZ,
        Allen-Cahn, Cahn-Hilliard, Kuramoto-Sivashinsky, Swift-Hohenberg,
        Brusselator, wave, ...) into a single kernel advancing several Euler
        steps per HBM pass; coupled multi-field systems (FieldCollection
        states) share the pass, rank-1 states lower as component planes
        (Cartesian grids, scalar BC values — the reference's rank-generic
        operators, ``numba/operators/cartesian.py:962-1076``), and the
        composition depth determines the halo consumed per step. Raises
        NotImplementedError when the structure or platform is unsupported, in
        which case solvers use the generic XLA lowering.
        """
        from ..ops.pallas_cartesian import interpret_requested

        if self.is_sde:
            # only simple additive noise can fuse: the increments are then
            # state-independent and can be generated outside the kernel with
            # the unfused stepper's exact key folding (identical trajectories)
            from .base import SDEBase

            if (
                type(self).make_noise_variance is not SDEBase.make_noise_variance
                or self.use_noise_realization
                or self._noise_drift_factor != 0
                or len(self.variables) != 1
            ):
                raise NotImplementedError(
                    "Fused window supports only additive scalar noise"
                )
            # Measured on v5e: XLA-side noise generation (threefry + erfinv)
            # dominates and its forced materialization makes the fused SDE
            # window a net LOSS (14.5 vs 21.3 G updates/s for KPZ 4096²,
            # docs/BENCHMARKS.md). Keep the external-noise variant opt-in on
            # real hardware; interpret mode (CPU tests) always takes it so
            # the machinery stays validated. The in-kernel hardware-PRNG
            # variant (cheap weak-scheme increments drawn inside the kernel,
            # `sde.kernel_noise`/`sde.increment_dist` config) measured a WIN
            # and needs no opt-in.
            import os

            if (
                not interpret_requested()
                and os.environ.get("PDE_TPU_FUSED_SDE") != "1"
                and self._sde_kernel_noise_spec(
                    state.grid, 1.0, False
                ) is None
            ):
                raise NotImplementedError(
                    "Fused SDE windows with exact XLA-stream noise are "
                    "opt-in (PDE_TPU_FUSED_SDE=1): measured slower than the "
                    "XLA path on TPU. Set sde.increment_dist='irwin4' for "
                    "the in-kernel fast path."
                )
        return self._emit_fused_window(state, dt, mesh, kind="euler")

    def _fused_stencil_lowering(self, state: FieldBase, mesh):
        """Shared gates + expression lowering for the fused solver windows
        (Euler and RK4): validates the state/grid/BC configuration and
        lowers each variable's rhs through the stencil helpers.

        Returns ``(fields, grid, exprs, var_map, bc_table, bc_inputs,
        depth, interpret, make_get_bc)``; raises NotImplementedError when
        the configuration cannot fuse (solvers then use the XLA lowering).
        """
        from ..grids.boundaries.axes import BoundariesList
        from ..ops.pallas_cartesian import (
            _HALO,
            PallasUnsupportedError,
            affine_bc_specs,
            collect_bc_side_inputs,
            interpret_requested,
        )

        if self.post_step_hook is not None or self.consts or self.user_funcs:
            raise NotImplementedError("Fused window unsupported for this PDE")
        if isinstance(state, FieldCollection):
            fields = list(state)
        elif isinstance(state, DataFieldBase):
            fields = [state]
        else:
            raise NotImplementedError("Fused window unsupported for this state")
        if len(fields) != len(self.variables) or any(
            f.rank not in (0, 1) for f in fields
        ):
            raise NotImplementedError(
                "Fused window requires scalar or vector fields"
            )
        if len({f.dtype for f in fields}) != 1:
            raise NotImplementedError("Fused window requires uniform dtypes")
        grid = fields[0].grid
        has_vector = any(f.rank == 1 for f in fields)
        interpret = interpret_requested()
        from ..grids.cylindrical import CylindricalSymGrid

        if (
            grid.num_axes == 2
            and not isinstance(grid, CylindricalSymGrid)
            and any("laplace" in self._operators[v] for v in self.variables)
        ):
            # the stencil helpers lower the 5-point 2D Laplacian only; the
            # corner-weight config does not alter 3D or cylindrical
            # stencils, so those keep fusing under it
            from ..ops.pallas_cartesian import _require_default_laplace_stencil

            try:
                _require_default_laplace_stencil()
            except PallasUnsupportedError as err:
                raise NotImplementedError(str(err)) from err

        if isinstance(grid, CylindricalSymGrid):
            # the kernel helpers model the cylindrical Laplacian (radial
            # per-row factor), the gradient (no radial term in its r/z
            # components), and the divergence (extra v_r/r via
            # helpers.divergence — round-4, closing the round-3 fallback);
            # vector_laplace stays excluded here (its cylindrical form has
            # component coupling — the rank-1 gate above already rejects
            # vector states on this grid class)
            safe = {
                "laplace", "gradient_squared", "gradient", "divergence",
                "dot", "inner",
            }
            used = set().union(*(self._operators[v] for v in self.variables))
            if used - safe:
                raise NotImplementedError(
                    "Fused window on cylindrical grids supports only "
                    f"{sorted(safe)} (got {sorted(used - safe)})"
                )
            if mesh is not None:
                raise NotImplementedError(
                    "Sharded fused windows do not support cylindrical grids"
                )

        if has_vector:
            # rank-1 states lower as component planes through the
            # multi-field windows (the reference's rank-generic native
            # operators, `numba/operators/cartesian.py:962-1076`);
            # component-wise stencils are only valid on Cartesian grids
            if isinstance(grid, CylindricalSymGrid):
                raise NotImplementedError(
                    "Fused vector windows require Cartesian grids"
                )
            if self.is_sde:
                raise NotImplementedError(
                    "Fused vector windows do not support noise"
                )
            if mesh is not None:
                raise NotImplementedError(
                    "Sharded fused windows require scalar fields"
                )

        var_map = {}
        _pos = 0
        for v, f in zip(self.variables, fields, strict=True):
            if f.rank == 0:
                var_map[sympy.Symbol(v)] = _pos
                _pos += 1
            else:
                var_map[sympy.Symbol(v)] = tuple(
                    range(_pos, _pos + grid.dim)
                )
                _pos += grid.dim
        exprs = []
        bc_table: dict[tuple[str, str], object] = {}
        for var, field in zip(self.variables, fields, strict=True):
            expr = sympy.expand(self._rhs_expr[var]._sympy_expr)
            if expr.has(sympy.Symbol("t")) or any(
                expr.has(sympy.Symbol(ax)) for ax in grid.axes
            ):
                raise NotImplementedError("Fused window requires an autonomous rhs")
            # every stencil operator needs periodic or const-affine BCs, which
            # lower into the kernel as ghost fixups (reference virtual-point
            # formulas, `local.py:1541-2104`)
            for func in self._operators[var]:
                bc = self._resolve_bc(var, func)
                bcs = grid.get_boundary_conditions(bc)
                if not isinstance(bcs, BoundariesList):
                    raise NotImplementedError("Fused window requires per-axis BCs")
                try:
                    specs = affine_bc_specs(grid, bcs)
                except PallasUnsupportedError as err:
                    raise NotImplementedError(str(err)) from err
                if field.rank == 1 and specs is not None and any(
                    axis is not None
                    and not (axis[0].is_scalar and axis[1].is_scalar)
                    for axis in specs
                ):
                    # a per-boundary-point array on a vector state is
                    # ambiguous between "per component" and "along the
                    # boundary" — only scalar-valued BCs lower
                    raise NotImplementedError(
                        "Fused vector windows require scalar BC values"
                    )
                bc_table[(var, func)] = specs
            exprs.append(expr)

        # inhomogeneous per-boundary-point arrays, array-valued Robin
        # factors, t-dependent consts AND t-dependent ghost coefficients
        # (mixed gamma varying in t), and space-and-time-dependent
        # expression consts become kernel side inputs across the 2D, 3D,
        # SDE, and sharded windows; the only remaining fallback is the
        # inherently non-affine forms — values nonlinear in the adjacent
        # value or coefficients varying in SPACE via an expression
        # (affine_bc_specs raises; arrays from the mixed BC class lower)
        if grid.num_axes == 3:
            from ..ops.pallas_cartesian import collect_bc_side_inputs_3d

            try:
                bc_inputs = collect_bc_side_inputs_3d(bc_table)
            except PallasUnsupportedError as err:
                raise NotImplementedError(str(err)) from err
        else:
            bc_inputs = collect_bc_side_inputs(bc_table)

        def make_get_bc(var):
            return lambda op_name: bc_table.get((var, op_name))

        # probe the lowering once (host-side) to find the stencil depth
        class _Probe:
            cols = 0
            lap = staticmethod(lambda x, bc=None: x)
            gradient_squared = staticmethod(lambda x, bc=None: x)
            d_row = staticmethod(lambda x, bc=None: x)
            d_col = staticmethod(lambda x, bc=None: x)
            derivatives = (d_row,) * grid.num_axes
            trim = staticmethod(lambda x, amount: x)

        depths = [
            self._lower_stencil_expr(
                e, var_map, _Probe,
                vector_components=grid.dim if f.rank == 1 else None,
            )[1]
            for e, f in zip(exprs, fields, strict=True)
        ]
        depth = max(depths)
        if depth == 0 or depth > _HALO:
            raise NotImplementedError(f"stencil depth {depth} out of range")
        return (
            fields, grid, exprs, var_map, bc_table, bc_inputs, depth,
            interpret, make_get_bc,
        )

    def make_fused_rk4_window(self, state: FieldBase, dt: float, mesh=None):
        """Emit a fused Pallas temporal-blocking window advancing classic
        fixed-dt RK4 steps (4 rhs stages per step inside the kernel).

        The same stencil lowering as :meth:`make_fused_euler_window`; each
        RK4 step consumes ``4*depth`` halo rows per side (one rhs
        evaluation per stage), so a depth-1 rhs blocks k=2 steps per HBM
        pass under the default 8-row halo granule. Deterministic only (the
        reference's native engine compiles every solver's loop,
        `/root/reference/pde/backends/numba/_solvers.py:469`; RK4 tableau
        `/root/reference/pde/solvers/runge_kutta.py:29-66`).

        Time-dependent BC values fuse on EVERY RK4 window path (serial 2D
        and 3D, 2D and 3D decompositions): the t/xt tables carry one row
        per (step, stage) and the step rebinds ghost values at ``t``,
        ``t + dt/2`` and ``t + dt`` between stages — matching the
        reference, which re-evaluates BCs per rhs call
        (`/root/reference/pde/backends/numba/_solvers.py:67-120`).
        Adaptive RK45 cannot temporally block at all: each step's
        accept/shrink decision depends on a GLOBAL error reduction over
        the full state, which a banded kernel cannot see.
        """
        if self.is_sde:
            raise NotImplementedError(
                "Deterministic RK4 windows do not support noise"
            )
        return self._emit_fused_window(state, dt, mesh, kind="rk4")

    def make_fused_ab2_window(self, state: FieldBase, dt: float, mesh=None):
        """Emit a fused Pallas temporal-blocking window advancing fixed-dt
        second-order Adams-Bashforth steps.

        The carried previous-rate planes ride as EXTRA fields of the
        multi-field window (they shrink with the light cone like any plane
        but consume no halo themselves), so ``halo_per_step = depth`` —
        the same temporal-block budget as the Euler window. The window
        declares ``n_aux`` carried planes; the solver bootstraps them with
        its backward-Euler guess and persists them across tracker windows
        (`solvers/adams_bashforth.py`; reference compiles every solver's
        loop in its fastest engine,
        `/root/reference/pde/backends/numba/_solvers.py:469`).

        Vector states do not fuse here (the rate planes would need the
        stacked-leaf adapter applied to half the window's fields);
        stochastic equations are rejected like the reference's AB solver.
        """
        if self.is_sde:
            raise NotImplementedError(
                "Adams-Bashforth windows do not support noise"
            )
        return self._emit_fused_window(state, dt, mesh, kind="ab2")

    def _emit_fused_window(self, state: FieldBase, dt: float, mesh, *, kind):
        from ..ops.pallas_cartesian import (
            PallasUnsupportedError,
            make_chunked_multi_window_2d,
            make_chunked_sde_window_2d,
            make_chunked_window_2d,
        )

        (
            fields, grid, exprs, var_map, bc_table, bc_inputs, depth,
            interpret, make_get_bc,
        ) = self._fused_stencil_lowering(state, mesh)

        # work-plane layout: rank-1 states occupy grid.dim consecutive
        # planes of the multi-field window (their components), scalars one
        slots = [var_map[sympy.Symbol(v)] for v in self.variables]
        n_planes = sum(
            len(s) if isinstance(s, tuple) else 1 for s in slots
        )
        has_vector = n_planes != len(fields)

        def lower_rhs_fns(ops):
            return [
                self._lower_stencil_expr(
                    e, var_map, ops, make_get_bc(v),
                    vector_components=(
                        len(s) if isinstance(s, tuple) else None
                    ),
                )
                for e, v, s in zip(exprs, self.variables, slots, strict=True)
            ]

        def plane_rates(ops, rhs_fns, ys):
            """Per-plane rates, broadcast to the trimmed plane shapes."""
            rates = []
            for (rhs_fn, d), slot in zip(rhs_fns, slots, strict=True):
                rate = ops.trim(rhs_fn(ys), depth - d)
                comps = rate if isinstance(slot, tuple) else (rate,)
                planes = slot if isinstance(slot, tuple) else (slot,)
                for comp, p in zip(comps, planes, strict=True):
                    tgt = ops.trim(ys[p], depth)
                    rates.append(
                        jnp.broadcast_to(jnp.asarray(comp), jnp.shape(tgt))
                    )
            return rates

        if kind == "rk4":
            halo_per_step = 4 * depth

            def make_multi_step(ops):
                rhs_fns = lower_rhs_fns(ops)
                # per-stage ghost times: the 2D kernel's t/xt tables carry
                # (step, stage) rows; stages read t, t+dt/2, t+dt/2, t+dt,
                # matching the unfused tableau (solvers/runge_kutta.py).
                # Resolved lazily — the kernel assigns ops.bind_stage right
                # before tracing step(works), after make_step(ops) ran.
                def bind(j):
                    fn = getattr(ops, "bind_stage", None)
                    if fn is not None:
                        fn(j)

                def rhs_all(ys):
                    return plane_rates(ops, rhs_fns, ys)

                def step(works):
                    t_ = ops.trim
                    k1 = rhs_all(works)
                    y2 = [t_(w, depth) + (0.5 * dt) * a
                          for w, a in zip(works, k1, strict=True)]
                    bind(1)
                    k2 = rhs_all(y2)
                    y3 = [t_(w, 2 * depth) + (0.5 * dt) * b
                          for w, b in zip(works, k2, strict=True)]
                    k3 = rhs_all(y3)
                    y4 = [t_(w, 3 * depth) + dt * c
                          for w, c in zip(works, k3, strict=True)]
                    bind(2)
                    k4 = rhs_all(y4)
                    return [
                        t_(w, 4 * depth)
                        + (dt / 6.0) * (
                            t_(a, 3 * depth)
                            + 2.0 * t_(b, 2 * depth)
                            + 2.0 * t_(c, depth)
                            + d_
                        )
                        for w, a, b, c, d_ in zip(
                            works, k1, k2, k3, k4, strict=True
                        )
                    ]

                return step

        elif kind == "ab2":
            if has_vector:
                raise NotImplementedError(
                    "Fused AB2 windows do not support vector states"
                )
            halo_per_step = depth

            def make_multi_step(ops):
                rhs_fns = lower_rhs_fns(ops)

                def step(all_works):
                    # planes [0:n] = states, [n:2n] = previous rates (no
                    # stencil reads them — trim keeps shapes in lockstep)
                    works = all_works[:n_planes]
                    prevs = all_works[n_planes:]
                    rates = plane_rates(ops, rhs_fns, works)
                    new = [
                        ops.trim(w, depth)
                        + dt * (1.5 * rc - 0.5 * ops.trim(rp, depth))
                        for w, rc, rp in zip(works, rates, prevs, strict=True)
                    ]
                    return new + list(rates)

                return step

        else:
            halo_per_step = depth

            def make_multi_step(ops):
                # shared by the sharded and single-device fused windows: any
                # change to the rate-trim/broadcast semantics applies to
                # both, preserving the sharded-vs-serial bit-identity
                # invariant
                rhs_fns = lower_rhs_fns(ops)

                def step(works):
                    rates = plane_rates(ops, rhs_fns, works)
                    return [
                        ops.trim(w, depth) + dt * rate
                        for w, rate in zip(works, rates, strict=True)
                    ]

                return step

        # AB2 carries its previous-rate planes as extra window fields
        win_planes = 2 * n_planes if kind == "ab2" else n_planes
        n_aux = n_planes if kind == "ab2" else 0

        if mesh is not None:
            # decomposed: all fields share the halo-extended kernel; halos
            # move via ppermute outside, physical (const-affine) BCs lower as
            # edge-flag-gated ghost fixups inside the kernel
            if self.is_sde:
                raise NotImplementedError("Sharded fused window does not support noise")
            from ..parallel.fused import make_fused_multi_window_sharded

            try:
                window = make_fused_multi_window_sharded(
                    mesh, make_multi_step, halo_per_step, win_planes,
                    dtype=fields[0].dtype, interpret=interpret,
                    bc_inputs=bc_inputs, dt=dt,
                    stage_offsets=(
                        (0.0, 0.5, 1.0) if kind == "rk4" else None
                    ),
                )
            except PallasUnsupportedError as err:
                raise NotImplementedError(str(err)) from err
            window.n_aux = n_aux
            return window

        if grid.num_axes == 3:
            # 3D rhs trees fuse through the 3D multi-field window (bands
            # over x, rolls on y/z) — the reference compiles all its 3D
            # stencils (`numba/operators/cartesian.py:109-192`)
            if self.is_sde:
                raise NotImplementedError(
                    "Fused 3D SDE windows are not supported"
                )
            from ..ops.pallas_cartesian import make_chunked_multi_window_3d

            try:
                window = make_chunked_multi_window_3d(
                    grid, make_multi_step, halo_per_step, win_planes,
                    dtype=fields[0].dtype, interpret=interpret,
                    bc_inputs=bc_inputs, dt=dt,
                    stage_offsets=(
                        (0.0, 0.5, 1.0) if kind == "rk4" else None
                    ),
                )
            except PallasUnsupportedError as err:
                raise NotImplementedError(str(err)) from err
            if has_vector:
                window = _wrap_vector_planes(window, slots)
            window.multi_field = True
            window.n_aux = n_aux
            return window

        if kind == "euler" and n_planes == 1:

            def make_step(ops):
                rhs_fn, d = self._lower_stencil_expr(
                    exprs[0], var_map, ops, make_get_bc(self.variables[0])
                )

                def step(work):
                    rate = rhs_fn([work])
                    center = ops.trim(work, d)
                    return center + dt * jnp.broadcast_to(
                        jnp.asarray(rate), center.shape
                    )

                return step

            if self.is_sde:
                # pre-scaled increments with the unfused stepper's key folding
                noise_step = self.make_sde_noise_step(fields[0])
                template = jnp.zeros(fields[0].data.shape, fields[0].dtype)

                def noise_fn(key, indices):
                    def one(i):
                        sub = jax.random.fold_in(key, i)
                        (inc,) = noise_step([template], 0.0, sub, dt)
                        return inc

                    return jax.vmap(one)(indices)

                try:
                    window = make_chunked_sde_window_2d(
                        grid, make_step, depth, noise_fn,
                        dtype=fields[0].dtype, interpret=interpret,
                        kernel_noise=self._sde_kernel_noise_spec(
                            grid, dt, interpret
                        ),
                        bc_inputs=bc_inputs, dt=dt,
                    )
                except PallasUnsupportedError as err:
                    raise NotImplementedError(str(err)) from err
                window.needs_key = True
                return window

            try:
                return make_chunked_window_2d(
                    grid, make_step, depth, dtype=fields[0].dtype,
                    interpret=interpret, bc_inputs=bc_inputs, dt=dt,
                )
            except PallasUnsupportedError as err:
                raise NotImplementedError(str(err)) from err

        try:
            window = make_chunked_multi_window_2d(
                grid, make_multi_step, halo_per_step, win_planes,
                dtype=fields[0].dtype, interpret=interpret,
                bc_inputs=bc_inputs, dt=dt,
                stage_offsets=(0.0, 0.5, 1.0) if kind == "rk4" else None,
            )
        except PallasUnsupportedError as err:
            raise NotImplementedError(str(err)) from err
        if has_vector:
            window = _wrap_vector_planes(window, slots)
        window.multi_field = True
        window.n_aux = n_aux
        return window

    def make_post_step_hook(self, state: FieldBase):
        if self.post_step_hook is None:
            raise NotImplementedError("`post_step_hook` not set")
        hook = self.post_step_hook
        is_collection = isinstance(state, FieldCollection)

        def post_step_hook(leaves, t, data):
            if is_collection:
                new = hook(list(leaves), t)
                return list(new), data
            new = hook(leaves[0], t)
            return [new], data

        return post_step_hook, 0.0

    # -- linear stability analysis -------------------------------------------------------------------
    def _jacobian_spectral(
        self,
        state_hom=None,
        *,
        t: float = 0,
        wave_vector="q",
        check_steady_state: bool = True,
    ) -> sympy.Matrix:
        """Jacobian in Fourier space (reference `pde.py:902`)."""
        if wave_vector == "t":
            raise ValueError("`wave_vector` must not be `t`")
        if wave_vector in self.variables:
            raise ValueError(f"`wave_vector` must differ from {self.variables}")

        if state_hom is None:
            state_dict = None
        else:
            if isinstance(state_hom, dict):
                state_dict = state_hom
            elif isinstance(state_hom, numbers.Number):
                state_dict = dict.fromkeys(self.variables, state_hom)
            else:
                if len(state_hom) != len(self.variables):
                    raise ValueError(f"Expect {len(self.variables)} values")
                state_dict = dict(zip(self.variables, state_hom, strict=True))
            for v, value in state_dict.items():
                if not isinstance(value, numbers.Number):
                    raise TypeError(f"Value for field `{v}` is not a number")

        q_sym = sympy.symbols(wave_vector)
        arg = sympy.symbols("argument")
        fourier_repl = {}
        for op, op_fourier in _OPERATOR_FOURIER_MAPPING.items():
            expr_f = sympy.parse_expr(op_fourier).subs(sympy.symbols("wave_vector"), q_sym)
            fourier_repl[sympy.symbols(op, cls=sympy.Function)] = sympy.Lambda(arg, expr_f)

        jacobian = []
        for v1 in self.variables:
            expr = self._rhs_expr[v1]._sympy_expr.subs("t", t)
            unsupported = {
                f.__class__.__name__ for f in expr.atoms(sympy.core.function.AppliedUndef)
            } - set(_OPERATOR_FOURIER_MAPPING)
            if unsupported:
                raise RuntimeError(
                    f"Operators {sorted(unsupported)} have no Fourier representation"
                )
            expr_f = expr.subs(fourier_repl)
            if check_steady_state and state_dict is not None:
                expr_f0 = expr_f.subs(wave_vector, 0)
                value = float(expr_f0.subs(state_dict))
                if not np.isclose(value, 0):
                    raise RuntimeError("State is not a stationary state")
            jac_line = []
            for v2 in self.variables:
                el = expr_f.diff(v2)
                if state_dict is not None:
                    el = el.subs(state_dict)
                jac_line.append(sympy.simplify(el))
            jacobian.append(jac_line)
        return sympy.Matrix(jacobian)

    # -- exponential-integrator support ---------------------------------------------------
    @staticmethod
    def _axis_spectral_kind(pair) -> str:
        """Transform kind diagonalizing the FD Laplacian along one axis.

        ``"periodic"`` (rfft modes), ``"neumann"`` (DCT-II modes, homogeneous
        no-flux both sides), or ``"dirichlet"`` (DST-II modes, homogeneous
        value-0 both sides); anything else raises NotImplementedError.
        """
        from ..grids.boundaries.local import DirichletBC, NeumannBC

        if pair.periodic:
            if getattr(pair.low, "flip_sign", False):
                raise NotImplementedError(
                    "The spectral split does not support anti-periodic axes"
                )
            return "periodic"
        for kind, cls in (("neumann", NeumannBC), ("dirichlet", DirichletBC)):
            if all(
                isinstance(bc, cls)
                and not getattr(bc, "normal", False)
                and np.all(np.asarray(bc.value) == 0)
                for bc in (pair.low, pair.high)
            ):
                return kind
        raise NotImplementedError(
            "The spectral split requires periodic, homogeneous-Neumann, or "
            "homogeneous-Dirichlet boundary conditions per axis"
        )

    def make_etdrk_parts(self, state, rhs_state=None):
        """Split the rhs into a spectral linear part and a nonlinear remainder.

        Returns an :class:`~pde_tpu.models.base.EtdrkParts` for exponential
        integrators (:class:`~pde_tpu.solvers.etdrk.ETDRK4Solver`). The
        linear constant-coefficient part — sums of ``c * laplace^m(u_j)`` and
        ``c * u_j`` over all fields — is evaluated per mode of the
        diagonalizing basis: rfft modes on periodic axes, DCT-II modes on
        homogeneous-Neumann axes, DST-II modes on homogeneous-Dirichlet axes
        (the eigenbases of the cell-centered ghost-cell stencils, so the
        integrator advances exactly the same semi-discretization as every
        other solver). For coupled FieldCollection systems ``L_vals`` holds
        per-mode ``(N, N)`` coupling matrices. ``nonlinear_rhs(leaves, t)``
        computes everything else. Linear operators are first distributed
        over sums (``laplace(a + b) -> laplace(a) + laplace(b)``) so e.g.
        Cahn-Hilliard's ``laplace(c**3 - c - laplace(c))`` splits into the
        stiff ``q**2 - q**4`` symbol plus ``laplace(c**3)``.

        There is no reference equivalent — py-pde handles stiffness by
        handing the rhs to scipy's implicit integrators on the host
        (`/root/reference/pde/solvers/scipy.py:17`).
        """
        from ..grids.cartesian import CartesianGrid
        from .base import EtdrkParts

        if self.is_sde:
            raise NotImplementedError("The spectral split is deterministic")
        grid = state.grid
        if not isinstance(grid, CartesianGrid):
            raise NotImplementedError(
                "The spectral split requires a Cartesian grid"
            )
        variables = self.variables
        n_fields = len(variables)
        # the modal basis must diagonalize every laplace application: check
        # the (var, laplace) BCs of every field that uses the operator
        axis_kinds = None
        for var in variables:
            if "laplace" not in self._operators[var]:
                continue  # no laplace terms: no constraint from this field
            bcs_resolved = grid.get_boundary_conditions(
                self._resolve_bc(var, "laplace")
            )
            kinds = tuple(self._axis_spectral_kind(p) for p in bcs_resolved)
            if axis_kinds is None:
                axis_kinds = kinds
            elif kinds != axis_kinds:
                raise NotImplementedError(
                    "The spectral split requires all fields to share the "
                    "same laplace boundary-condition types"
                )
        if axis_kinds is None:
            # no laplace anywhere: any orthogonal basis works — pick by
            # grid periodicity so the transform stays well-defined
            axis_kinds = tuple(
                "periodic" if p else "neumann" for p in grid.periodic
            )

        # substitute scalar consts so e.g. `D*laplace(c)` with consts={'D':1}
        # keeps the stiff term in the exponential part instead of silently
        # dropping it into the explicit remainder (coeff.is_number is False
        # for an unsubstituted Symbol)
        scalar_consts = {
            sympy.Symbol(name): float(value)
            for name, value in self.consts.items()
            if isinstance(value, numbers.Number) and not isinstance(value, complex)
        }
        u_syms = [sympy.Symbol(v) for v in variables]
        q = sympy.Symbol("__wave_number")
        lin_matrix = [
            [sympy.S.Zero for _ in variables] for _ in variables
        ]
        rest_exprs = {}
        for i1, var in enumerate(variables):
            expr = self._rhs_expr[var]._sympy_expr
            if scalar_consts:
                expr = expr.subs(scalar_consts)
            expr = self._distribute_linear_ops(sympy.expand(expr))
            expr = sympy.expand(expr)
            rest_terms = []
            for term in expr.as_ordered_terms():
                matched = False
                for i2, u2 in enumerate(u_syms):
                    if not term.has(u2):
                        continue
                    sym = self._linear_term_symbol(term, u2, q)
                    if sym is not None:
                        lin_matrix[i1][i2] = lin_matrix[i1][i2] + sym
                        matched = True
                    break  # a linear term involves exactly one field symbol
                if not matched:
                    rest_terms.append(term)
            rest_exprs[var] = (
                sympy.Add(*rest_terms) if rest_terms else sympy.S.Zero
            )

        # evaluate the symbols with the DISCRETE Laplacian eigenvalues of the
        # per-axis modal bases (λ(k) = -4 sin²(·)/dx² chains); a continuum
        # -|q|² symbol would silently change the spatial scheme
        from ..ops.common import (
            dirichlet_laplace_eigenvalues_1d,
            laplace_eigenvalues_1d,
            neumann_laplace_eigenvalues_1d,
        )

        periodic_axes = [
            ax for ax, kind in enumerate(axis_kinds) if kind == "periodic"
        ]
        half_axis = periodic_axes[-1] if periodic_axes else None
        lam_axes = []
        for ax, (n, dx, kind) in enumerate(
            zip(grid.shape, grid.discretization, axis_kinds, strict=True)
        ):
            if kind == "periodic":
                lam_ax = laplace_eigenvalues_1d(
                    n, float(dx), real_half=ax == half_axis
                )
            elif kind == "neumann":
                lam_ax = neumann_laplace_eigenvalues_1d(n, float(dx))
            else:
                lam_ax = dirichlet_laplace_eigenvalues_1d(n, float(dx))
            shape = [1] * grid.num_axes
            shape[ax] = len(lam_ax)
            lam_axes.append(lam_ax.reshape(shape))

        # honor the configured 9-point corner-weight Laplacian: the stencil
        # is A⊗I + I⊗B + c·A⊗B over the per-axis second differences, so its
        # exact eigenvalues are a·λx + b·λy + c·λx·λy in the same tensor
        # basis; silently using the 5-point chain would make ETDRK4 integrate
        # a different semi-discretization than every other solver
        from ..utils.config import config

        corner_weight = 0.0
        if grid.num_axes == 2:
            corner_weight = float(
                config["operators.cartesian.laplacian_2d_corner_weight"]
            )
        uses_laplace = any(sym.has(q) for row in lin_matrix for sym in row)
        if corner_weight != 0.0 and uses_laplace:
            if any(kind != "periodic" for kind in axis_kinds):
                raise NotImplementedError(
                    "The spectral split supports the corner-weight Laplacian "
                    "(laplacian_2d_corner_weight != 0) only on fully periodic "
                    "grids — the corner-ghost extrapolation on physical "
                    "boundaries is not an exact tensor-product operator"
                )
            w = corner_weight
            sx, sy = (float(d) ** -2 for d in grid.discretization)
            dm2 = sx + sy
            lam = (
                ((1 - w) + dm2 * w / (2 * sx)) * lam_axes[0]
                + ((1 - w) + dm2 * w / (2 * sy)) * lam_axes[1]
                + dm2 * w / (4 * sx * sy) * lam_axes[0] * lam_axes[1]
            )
        else:
            lam = lam_axes[0]
            for lam_ax in lam_axes[1:]:
                lam = lam + lam_ax

        def eval_symbol(sym):
            if sym == 0:
                return np.zeros(lam.shape)
            # symbols contain only even powers of q ((-q²)^m chains), so
            # substituting q = sqrt(-λ) evaluates (-q²)^m as λ^m exactly
            sym_fn = sympy.lambdify(q, sym, modules="numpy")
            vals = np.asarray(sym_fn(np.sqrt(-lam)), dtype=float)
            return np.broadcast_to(vals, lam.shape).copy()

        if n_fields == 1:
            L_vals = eval_symbol(lin_matrix[0][0])
        else:
            L_vals = np.zeros((*lam.shape, n_fields, n_fields))
            for i1 in range(n_fields):
                for i2 in range(n_fields):
                    if lin_matrix[i1][i2] != 0:
                        L_vals[..., i1, i2] = eval_symbol(lin_matrix[i1][i2])

        sub_pde = PDE(
            {var: str(rest_exprs[var]) for var in variables},
            bc=self.bcs.get("*:*"),
            bc_ops={k: v for k, v in self.bcs.items() if k != "*:*"},
            user_funcs=self.user_funcs,
            consts=self.consts,
        )
        # decomposed runs pass the shard-0 SUBGRID template as `rhs_state`:
        # the modal data above stays GLOBAL while the remainder evaluates
        # with ShardedBoundaries halos inside shard_map
        nonlinear_rhs = sub_pde.make_pde_rhs(
            state if rhs_state is None else rhs_state
        )
        return EtdrkParts(L_vals, nonlinear_rhs, axis_kinds, n_fields)

    @staticmethod
    def _distribute_linear_ops(expr):
        """Rewrite ``laplace(a + c*b) -> laplace(a) + c*laplace(b)`` (fixpoint)
        for the Fourier-mappable linear operators."""
        from sympy.core.function import AppliedUndef

        linear_ops = set(_OPERATOR_FOURIER_MAPPING)

        def rewrite_once(e):
            def matches(node):
                return (
                    isinstance(node, AppliedUndef)
                    and node.func.__name__ in linear_ops
                    and len(node.args) == 1
                )

            def apply(node):
                arg = sympy.expand(node.args[0])
                if arg.is_Add:
                    return sympy.Add(*[node.func(a) for a in arg.args])
                coeff, core = arg.as_coeff_Mul()
                if coeff != 1:
                    return coeff * node.func(core)
                return node.func(arg)

            return e.replace(matches, apply)

        for _ in range(8):  # nesting depth bound; fixpoint in practice
            new = rewrite_once(expr)
            if new == expr:
                break
            expr = new
        return expr

    @classmethod
    def _linear_term_symbol(cls, term, u, q):
        """Fourier symbol of a term linear in `u` via laplace chains, or None.

        Supported shapes: ``c * u`` and ``c * laplace(...laplace(u)...)``
        with ``c`` free of ``u`` and real. Gradient/divergence terms (odd,
        anisotropic symbols) and everything nonlinear return None and stay
        in the remainder.
        """
        from sympy.core.function import AppliedUndef

        coeff, core = term.as_independent(u, as_Add=False)
        if coeff.has(u) or not coeff.is_number or not coeff.is_real:
            return None
        symbol = sympy.S.One
        node = core
        while True:
            if node == u:
                return coeff * symbol
            if (
                isinstance(node, AppliedUndef)
                and node.func.__name__ == "laplace"
                and len(node.args) == 1
            ):
                symbol = symbol * (-(q**2))
                node = node.args[0]
                continue
            return None

    def _dispersion_relation(self, state_hom, qs=None, *, t: float = 0):
        """Eigenvalues of the spectral Jacobian over wave numbers (reference `pde.py:1005`)."""
        if qs is None:
            qs = np.linspace(0, 1)
        jac = self._jacobian_spectral(state_hom, t=t, wave_vector="wave_vector")
        evs_list = []
        for q in qs:
            jac_n = sympy.matrix2numpy(jac.subs("wave_vector", q), dtype=complex)
            evs_list.append(np.linalg.eigvals(jac_n))
        return qs, np.array(evs_list)
