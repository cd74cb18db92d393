"""Native (C++) runtime components, built lazily with the system toolchain.

Each component is a small shared library compiled on first use from the
sources in this directory and cached next to them (``_build/``).  Builds are
cheap (<2 s) and keyed on the source mtime, so a fresh checkout works with
nothing but ``g++`` and the linked system libraries present.
"""

from __future__ import annotations

import logging
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_logger = logging.getLogger(__name__)


def build_library(name: str, sources: list[str], libs: list[str]) -> str | None:
    """Compile ``sources`` into ``_build/lib<name>.so`` and return its path.

    Returns ``None`` (after logging) when the toolchain or a linked library
    is unavailable — callers treat that as "native component absent" and
    fall back, mirroring how optional Python dependencies are handled.
    """
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    srcs = [os.path.join(_HERE, s) for s in sources]
    with _LOCK:
        try:
            newest = max(os.path.getmtime(s) for s in srcs)
            if os.path.exists(out) and os.path.getmtime(out) >= newest:
                return out
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cmd = (
                ["g++", "-O2", "-shared", "-fPIC", "-o", out]
                + srcs
                + [f"-l{lib}" for lib in libs]
            )
            res = subprocess.run(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, timeout=120,
            )
            if res.returncode != 0:
                _logger.warning(
                    "building native %s failed:\n%s", name, res.stdout
                )
                return None
            return out
        except (OSError, subprocess.SubprocessError) as err:
            _logger.warning("building native %s failed: %s", name, err)
            return None
