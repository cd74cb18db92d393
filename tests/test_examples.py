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
    try:
        runpy.run_path(str(path), run_name="__main__")
    finally:
        plt.close("all")
