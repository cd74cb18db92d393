"""Sphinx configuration for the pde_tpu documentation.

Mirrors the reference's doc setup (`/root/reference/docs/source/conf.py`)
with autodoc over the installed package. `make html` in `docs/` builds the
tree with sphinx; environments without sphinx can use
`python docs/build_docs.py`, which falls back to a stdlib-based API
generator producing the same page set.
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pde_tpu"
author = "pde_tpu developers"
copyright = "2026, pde_tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autosummary_generate = True
autodoc_member_order = "bysource"
napoleon_google_docstring = True
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

templates_path = []
exclude_patterns = []
html_theme = "alabaster"
