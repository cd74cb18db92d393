"""Audit judge-facing docs against the code.

Rounds 3 and 4 both found doc rot in ``docs/PARITY.md`` (claims contradicted
by a same-round commit). This module makes the checkable claims executable:

- every repo-relative file path mentioned in PARITY.md / CLAUDE.md /
  docs/DESIGN.md exists,
- the pallas-registry contract stated in PARITY.md matches the code
  (unregistered operators RAISE, they do not inherit the XLA factory),
- backend names and config keys named in CLAUDE.md resolve.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

import pde_tpu as pde
from pde_tpu.backends import get_backend, registered_backends

REPO = Path(__file__).resolve().parent.parent

#: path prefixes that are claims about THIS repo (reference pointers such as
#: ``backends/base.py:257`` are relative to /root/reference/pde and are not
#: audited here)
_REPO_PREFIXES = ("pde_tpu/", "tests/", "scripts/", "docs/", "examples/")


def _expand_braces(path: str) -> list[str]:
    """Expand one level of ``{a,b,c}`` shell-style brace alternatives."""
    m = re.search(r"\{([^{}]*)\}", path)
    if not m:
        return [path]
    head, tail = path[: m.start()], path[m.end() :]
    out = []
    for alt in m.group(1).split(","):
        out.extend(_expand_braces(head + alt + tail))
    return out


def _doc_paths(doc: Path) -> list[str]:
    """Repo-relative file paths claimed by a markdown document."""
    text = doc.read_text()
    hits = re.findall(r"`([A-Za-z0-9_./{},*-]+\.(?:py|cpp|md|json|sh))[:`]", text)
    paths = []
    for hit in hits:
        for candidate in _expand_braces(hit):
            if candidate.startswith(_REPO_PREFIXES) and "*" not in candidate:
                paths.append(candidate)
    return sorted(set(paths))


@pytest.mark.parametrize(
    "doc", ["docs/PARITY.md", "CLAUDE.md", "docs/DESIGN.md", "docs/BENCHMARKS.md"]
)
def test_doc_paths_exist(doc):
    missing = [p for p in _doc_paths(REPO / doc) if not (REPO / p).exists()]
    assert not missing, f"{doc} names files that do not exist: {missing}"


def test_parity_pallas_registry_claim_matches_code():
    """PARITY.md's registry contract must match the code (round-4 doc rot)."""
    text = (REPO / "docs/PARITY.md").read_text()
    assert "inherit the XLA factory" not in text, (
        "PARITY.md claims pallas inheritance of XLA factories; the code "
        "raises PallasUnsupportedError since round 4 (backends.py)"
    )
    assert "PallasUnsupportedError" in text

    # and the code really raises for an unregistered operator
    from pde_tpu.ops.pallas_cartesian import PallasUnsupportedError

    grid = pde.UnitGrid([8, 8], periodic=True)
    with pytest.raises(PallasUnsupportedError):
        get_backend("pallas").make_operator(grid, "no_such_operator", "auto_periodic_neumann")


def test_parity_movie_claim_matches_code():
    """§2.7 must describe the native codec, not a bare ffmpeg pipe."""
    text = (REPO / "docs/PARITY.md").read_text()
    sec = text.split("## §2.7")[1].split("## §2.8")[0]
    assert "native" in sec and "movie_codec.cpp" in sec
    assert (REPO / "pde_tpu/native/movie_codec.cpp").exists()


def test_claude_md_flags_resolve():
    """Env flags and config keys CLAUDE.md documents must exist in the code."""
    text = (REPO / "CLAUDE.md").read_text()
    src = "".join(
        (REPO / f).read_text()
        for f in (
            "pde_tpu/ops/pallas_cartesian.py",
            "pde_tpu/models/base.py",
            "pde_tpu/solvers/base.py",
            "pde_tpu/parallel/fused.py",
        )
    )
    for flag in re.findall(r"`(PDE_TPU_[A-Z_]+)(?:=\d)?`", text):
        assert flag in src or flag == "PDE_TPU_TEST_PLATFORM", flag

    from pde_tpu.utils.config import config

    for key in ("sde.rng_impl", "sde.increment_dist", "sde.kernel_noise"):
        config[key]  # raises KeyError if the documented key is gone


def test_backend_names_registry():
    for name in registered_backends():
        assert get_backend(name) is not None
