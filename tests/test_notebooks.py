"""Execute the tutorial notebooks (mirrors the reference's notebook tests,
`tests/test_examples.py` notebook branch)."""

import os
from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

REPO_ROOT = Path(__file__).resolve().parents[1]
NOTEBOOK_DIR = REPO_ROOT / "examples" / "jupyter"
NOTEBOOKS = sorted(NOTEBOOK_DIR.glob("*.ipynb"))


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook(path, monkeypatch):
    # the kernel is a fresh process with cwd=NOTEBOOK_DIR; pde_tpu is imported
    # from the repo root, so the kernel needs it on PYTHONPATH explicitly
    pythonpath = os.environ.get("PYTHONPATH", "")
    monkeypatch.setenv(
        "PYTHONPATH", f"{REPO_ROOT}{os.pathsep}{pythonpath}" if pythonpath else str(REPO_ROOT)
    )
    def run_once():
        nb = nbformat.read(path, as_version=4)
        client = nbclient.NotebookClient(
            nb, timeout=600, startup_timeout=300, kernel_name="python3",
            resources={"metadata": {"path": str(NOTEBOOK_DIR)}},
        )
        client.execute()

    try:
        run_once()
    except Exception:
        # notebooks execute in external ipykernel processes over zmq; under
        # heavy machine load a cell or the kernel handshake can exceed its
        # timeout (~1 flake per full-suite run, always passing standalone) —
        # retry once on a fresh kernel before declaring failure
        run_once()
