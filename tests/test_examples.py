"""Run every example script (in-process, headless matplotlib).

Mirrors the reference's example tests (`tests/test_examples.py:39`).
"""

import os
import runpy
from pathlib import Path

import matplotlib
import pytest

matplotlib.use("Agg")

EXAMPLES_DIR = Path(__file__).resolve().parents[1] / "examples"
EXAMPLES = sorted(EXAMPLES_DIR.glob("*.py"))

SLOW_EXAMPLES = {"kymograph_1d.py", "solver_comparison.py"}


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example(path, monkeypatch):
    if path.name in SLOW_EXAMPLES and os.environ.get("RUN_SLOW") != "1":
        pytest.skip("slow example (set RUN_SLOW=1)")
    import matplotlib.pyplot as plt

    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    # examples run in-process: restore any os.environ mutations they make
    # (e.g. backend_selection.py sets PDE_TPU_PALLAS_INTERPRET for its demo),
    # which would otherwise flip later tests onto different code paths
    env_snapshot = dict(os.environ)
    try:
        runpy.run_path(str(path), run_name="__main__")
    finally:
        plt.close("all")
        os.environ.clear()
        os.environ.update(env_snapshot)
