"""The documentation tree must build (reference ships a sphinx tree,
`/root/reference/docs/source/`; here `make html` uses sphinx when present
and a stdlib fallback otherwise, so the build works hermetically)."""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]


def test_docs_build(tmp_path):
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "MPLBACKEND": "Agg",
                "PYTHONPATH": str(REPO_ROOT)})
    result = subprocess.run(
        [sys.executable, str(REPO_ROOT / "docs" / "build_docs.py")],
        cwd=REPO_ROOT / "docs", env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    build = REPO_ROOT / "docs" / "build" / "html"
    for page in ("index.html", "getting_started.html", "gallery.html",
                 "api.html", "manual/grids.html", "manual/solvers.html",
                 "manual/sharding.html", "manual/performance.html"):
        assert (build / page).exists(), page
    index = (build / "index.html").read_text()
    assert "DiffusionPDE" in index
    # the API reference introspects the real package
    solvers = build / "api" / "pde_tpu.solvers.etdrk.html"
    assert solvers.exists()
    assert "ETDRK4Solver" in solvers.read_text()
    grids = build / "api" / "pde_tpu.grids.cartesian.html"
    assert "CartesianGrid" in grids.read_text()
