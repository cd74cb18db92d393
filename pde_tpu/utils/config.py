"""Global configuration system.

TPU-native re-design of the reference configuration layer
(`/root/reference/pde/tools/config.py:58,385`): typed :class:`Parameter` objects
stored in a nested, dotted-key addressable :class:`Config` with
insert/update/locked modes and context-manager overrides.
"""

from __future__ import annotations

import contextlib
import platform
import sys
from dataclasses import dataclass
from typing import Any


@dataclass
class Parameter:
    """A single configuration parameter with metadata."""

    name: str
    default_value: Any = None
    cls: Any = object
    description: str = ""

    def convert(self, value: Any) -> Any:
        if self.cls is object or value is None:
            return value
        try:
            return self.cls(value)
        except (TypeError, ValueError):
            return value


class Config:
    """Nested dictionary of :class:`Parameter` values with access modes.

    Modes:
        * ``insert``: new keys may be added freely
        * ``update``: only existing keys may be changed
        * ``locked``: no changes allowed
    """

    def __init__(self, parameters=None, mode: str = "update"):
        self._data: dict[str, Any] = {}
        self.mode = "insert"
        for p in parameters or []:
            self[p.name] = p
        self.mode = mode

    # -- helpers ------------------------------------------------------------
    def _descend(self, key: str, create: bool = False):
        parts = key.split(".")
        node = self._data
        for part in parts[:-1]:
            if part not in node:
                if not create:
                    raise KeyError(key)
                node[part] = {}
            node = node[part]
            if isinstance(node, Config):
                node = node._data
        return node, parts[-1]

    def __getitem__(self, key: str) -> Any:
        node, last = self._descend(key)
        value = node[last]
        if isinstance(value, Parameter):
            return value.default_value
        if isinstance(value, dict):
            sub = Config(mode=self.mode)
            sub._data = value
            return sub
        return value

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def __setitem__(self, key: str, value: Any) -> None:
        if self.mode == "locked":
            raise RuntimeError("Configuration is locked")
        try:
            node, last = self._descend(key, create=(self.mode == "insert"))
        except KeyError:
            raise KeyError(f"Unknown configuration key `{key}`") from None
        if last in node:
            current = node[last]
            if isinstance(current, Parameter):
                current.default_value = current.convert(value)
                return
            node[last] = value
        elif self.mode == "insert":
            node[last] = value
        else:
            raise KeyError(f"Unknown configuration key `{key}`")

    def __contains__(self, key: str) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    def _flat_items(self, node=None, prefix=""):
        node = self._data if node is None else node
        for k, v in node.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                yield from self._flat_items(v, key + ".")
            elif isinstance(v, Parameter):
                yield key, v.default_value
            else:
                yield key, v

    def items(self):
        return list(self._flat_items())

    def to_dict(self) -> dict[str, Any]:
        return dict(self._flat_items())

    def __iter__(self):
        return iter(self.to_dict())

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}({self.to_dict()})"

    @contextlib.contextmanager
    def __call__(self, values: dict[str, Any] | None = None, **kwargs):
        """Context manager temporarily changing configuration values."""
        overrides = dict(values or {})
        overrides.update(kwargs)
        saved = {k: self[k] for k in overrides}
        mode = self.mode
        self.mode = "update"
        try:
            for k, v in overrides.items():
                self[k] = v
            self.mode = mode
            yield self
        finally:
            self.mode = "update"
            for k, v in saved.items():
                self[k] = v
            self.mode = mode


DEFAULT_CONFIG = [
    Parameter(
        "boundaries.accept_lists",
        True,
        bool,
        "Whether legacy list-format boundary conditions are accepted",
    ),
    Parameter(
        "operators.conservative_stencil",
        True,
        bool,
        "Use conservative stencils for curvilinear operators",
    ),
    Parameter(
        "operators.tensor_symmetry_check",
        True,
        bool,
        "Check tensor symmetry where operators require it",
    ),
    Parameter(
        "operators.cartesian.default_backend",
        "auto",
        str,
        "Operator lowering: 'auto' (pallas on TPU, jnp elsewhere), 'jnp' or 'pallas'",
    ),
    Parameter(
        "operators.cartesian.laplacian_2d_corner_weight",
        0.0,
        float,
        "Weight of corner points in the 2d Cartesian Laplacian stencil "
        "(1/2: Oono-Puri, 1/3: Patra-Karttunen)",
    ),
    Parameter(
        "sde.rng_impl",
        "threefry2x32",
        str,
        "PRNG key implementation for SDE noise: 'threefry2x32' (default; "
        "reproducible across backends), 'rbg' or 'unsafe_rbg' (XLA "
        "RngBitGenerator — much faster bit generation on TPU, streams may "
        "differ between backends/compiler versions)",
    ),
    Parameter(
        "sde.increment_dist",
        "normal",
        str,
        "Distribution of Euler-Maruyama noise increments: 'normal' (default; "
        "required for strong/pathwise convergence), 'irwin4' (sum of 4 "
        "uniforms, exact first three moments — weak order 1 preserved, "
        "~2x cheaper generation on TPU), 'rademacher' (two-point law, the "
        "minimal weak-order-1 increment)",
    ),
    Parameter(
        "sde.kernel_noise",
        "auto",
        str,
        "Where fused SDE windows generate increments: 'auto' (default; "
        "in-kernel TPU hardware PRNG when increment_dist is a cheap weak "
        "law, XLA threefry staging otherwise), 'on' (always in-kernel — "
        "stream not bit-reproducible vs the XLA path), 'off' (always "
        "staged through HBM with the XLA stream)",
    ),
    Parameter(
        "numba.multithreading_threshold",  # accepted for API compat; unused on TPU
        256**2,
        int,
        "Unused compatibility setting",
    ),
]


config = Config(DEFAULT_CONFIG, mode="update")


def environment() -> dict[str, Any]:
    """Diagnostic information about the current environment."""
    import jax

    import pde_tpu

    env: dict[str, Any] = {
        "package version": pde_tpu.__version__,
        "python version": sys.version,
        "platform": platform.platform(),
        "config": config.to_dict(),
        "jax version": jax.__version__,
        "jax devices": [str(d) for d in jax.devices()],
        "jax default backend": jax.default_backend(),
        "x64 enabled": bool(jax.config.jax_enable_x64),
    }
    for pkg in ("numpy", "sympy", "scipy", "h5py", "matplotlib"):
        try:
            env[f"{pkg} version"] = __import__(pkg).__version__
        except ImportError:
            env[f"{pkg} version"] = "not available"
    return env


def packages_from_requirements(requirements_file) -> list[str]:
    """Read package names from a requirements file."""
    try:
        with open(requirements_file) as fh:
            return [
                line.split(">=")[0].split("==")[0].strip()
                for line in fh
                if line.strip() and not line.startswith("#")
            ]
    except OSError:
        return []
