"""Execute the tutorial notebooks (mirrors the reference's notebook tests,
`tests/test_examples.py` notebook branch).

The notebooks contain plain Python (no IPython magics — asserted below), so
each one executes as a concatenated script in a fresh subprocess instead of
an ipykernel. This removes the jupyter/zmq kernel-handshake overhead
(~10 s per notebook on this machine) and the under-load handshake timeouts
that previously needed a retry-on-fresh-kernel guard.
"""

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")

REPO_ROOT = Path(__file__).resolve().parents[1]
NOTEBOOK_DIR = REPO_ROOT / "examples" / "jupyter"
NOTEBOOKS = sorted(NOTEBOOK_DIR.glob("*.ipynb"))

_MAGIC = re.compile(r"^\s*[%!]")


def _notebook_script(path: Path) -> str:
    nb = nbformat.read(path, as_version=4)
    chunks = []
    for i, cell in enumerate(nb.cells):
        if cell.cell_type != "code":
            continue
        src = cell.source
        for line in src.splitlines():
            assert not _MAGIC.match(line), (
                f"{path.name} cell {i} uses an IPython magic; "
                "execute it with nbclient instead"
            )
        chunks.append(f"# --- cell {i} ---\n{src}")
    return "\n\n".join(chunks)


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook(path, tmp_path):
    script = tmp_path / (path.stem + ".py")
    script.write_text(_notebook_script(path))
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": str(REPO_ROOT),
        "MPLBACKEND": "Agg",
        "JAX_PLATFORMS": "cpu",
    })
    result = subprocess.run(
        [sys.executable, str(script)],
        cwd=NOTEBOOK_DIR, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert result.returncode == 0, (
        f"{path.name} failed:\n{result.stdout[-2000:]}\n{result.stderr[-4000:]}"
    )
