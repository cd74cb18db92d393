#!/usr/bin/env python
"""Build the pde_tpu HTML documentation.

Uses sphinx (``sphinx-build -b html``) when it is installed — the full
autodoc tree defined in ``source/`` — and otherwise falls back to a
stdlib-only generator that renders the same manual pages plus an
introspected API reference, so ``make html`` stays green in hermetic
environments (this image ships no sphinx). Mirrors the reference's
buildable doc tree (`/root/reference/docs/source/`).
"""

from __future__ import annotations

import html
import importlib
import inspect
import pkgutil
import re
import shutil
import subprocess
import sys
from pathlib import Path

DOCS = Path(__file__).resolve().parent
SOURCE = DOCS / "source"
BUILD = DOCS / "build" / "html"

PAGES = [
    "index",
    "getting_started",
    "manual/grids",
    "manual/fields",
    "manual/pdes",
    "manual/solvers",
    "manual/sharding",
    "manual/performance",
    "gallery",
]

API_PACKAGES = [
    "pde_tpu.grids",
    "pde_tpu.fields",
    "pde_tpu.models",
    "pde_tpu.solvers",
    "pde_tpu.trackers",
    "pde_tpu.storage",
    "pde_tpu.visualization",
    "pde_tpu.ops",
    "pde_tpu.parallel",
    "pde_tpu.utils",
]

STYLE = """
body { font-family: sans-serif; max-width: 60em; margin: 2em auto;
       padding: 0 1em; line-height: 1.5; color: #202020; }
pre { background: #f4f4f4; padding: .8em; overflow-x: auto; }
code { background: #f4f4f4; padding: 0 .2em; }
h1, h2, h3 { color: #104060; }
nav { border-bottom: 1px solid #ccc; margin-bottom: 1.5em;
      padding-bottom: .5em; font-size: .9em; }
.sig { background: #eef4f8; padding: .4em .6em; margin-top: 1.2em;
       font-family: monospace; white-space: pre-wrap; }
.doc { margin: .4em 0 .4em 1.5em; white-space: pre-wrap; }
"""


def try_sphinx() -> bool:
    if shutil.which("sphinx-build") is None:
        try:
            import sphinx  # noqa: F401
        except ImportError:
            return False
    result = subprocess.run(
        [sys.executable, "-m", "sphinx", "-b", "html", str(SOURCE), str(BUILD)],
        cwd=DOCS,
    )
    return result.returncode == 0


# -- minimal rst-to-html rendering (fallback path only) ------------------------------


def _render_rst(text: str) -> str:
    """Render the subset of rst used by our manual pages to HTML."""
    out: list[str] = []
    lines = text.splitlines()
    i = 0
    in_code = False
    code: list[str] = []
    para: list[str] = []

    def flush_para():
        if para:
            content = " ".join(para)
            content = html.escape(content)
            content = re.sub(r"``([^`]+)``", r"<code>\1</code>", content)
            content = re.sub(r"\*\*([^*]+)\*\*", r"<b>\1</b>", content)
            content = re.sub(
                r":[a-z]+:`~?([^`]+)`",
                lambda m: f"<code>{m.group(1).split('.')[-1]}</code>",
                content,
            )
            out.append(f"<p>{content}</p>")
            para.clear()

    while i < len(lines):
        line = lines[i]
        if in_code:
            if line.strip() and not line.startswith((" ", "\t")):
                out.append(f"<pre>{html.escape('\n'.join(code))}</pre>")
                code.clear()
                in_code = False
            else:
                code.append(line[4:] if line.startswith("    ") else line)
                i += 1
                continue
        if line.startswith(".. code-block") or line.rstrip().endswith("::"):
            flush_para()
            stripped = line.rstrip()
            if stripped.endswith("::") and not stripped.startswith(".."):
                text_part = stripped[:-2].rstrip(":").strip()
                if text_part:
                    para.append(text_part + ":")
                flush_para()
            in_code = True
            i += 1
            while i < len(lines) and not lines[i].strip():
                i += 1
            continue
        if line.startswith(".."):  # directives (toctree etc.): skip block
            i += 1
            while i < len(lines) and (
                not lines[i].strip() or lines[i].startswith((" ", "\t"))
            ):
                if lines[i].strip() and ".. " not in lines[i]:
                    name = lines[i].strip()
                    if "/" in name or name.isidentifier():
                        out.append(
                            f'<li><a href="{name}.html">{name}</a></li>'
                        )
                i += 1
            continue
        if i + 1 < len(lines) and re.fullmatch(r"[=\-~^\"]{3,}", lines[i + 1].strip() or "x"):
            flush_para()
            level = {"=": 1, "-": 2, "~": 3, "^": 3, '"': 3}[lines[i + 1].strip()[0]]
            out.append(f"<h{level}>{html.escape(line.strip())}</h{level}>")
            i += 2
            continue
        if not line.strip():
            flush_para()
            i += 1
            continue
        if line.startswith("- "):
            flush_para()
            item = html.escape(line[2:])
            item = re.sub(r"``([^`]+)``", r"<code>\1</code>", item)
            out.append(f"<li>{item}</li>")
            i += 1
            continue
        para.append(line.strip())
        i += 1
    if in_code and code:
        out.append(f"<pre>{html.escape('\n'.join(code))}</pre>")
    flush_para()
    return "\n".join(out)


def _nav() -> str:
    links = " | ".join(
        f'<a href="{"../" if "/" in p else ""}{p.split("/")[-1]}.html">'
        f"{p.split('/')[-1].replace('_', ' ')}</a>"
        for p in PAGES
    )
    return f'<nav>{links} | <a href="api.html">API</a></nav>'


def _page(title: str, body: str, depth: int = 0) -> str:
    nav = _nav()
    if depth:
        nav = nav.replace('href="../', 'href="SENTINEL').replace(
            'href="', 'href="../'
        ).replace('href="../SENTINEL', 'href="../')
        nav = nav.replace('href="../../', 'href="../')
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)} — pde_tpu</title>"
        f"<style>{STYLE}</style></head><body>{nav}{body}</body></html>"
    )


def _api_module_html(modname: str) -> str:
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{modname}</code></h1>"]
    if mod.__doc__:
        parts.append(f"<div class='doc'>{html.escape(mod.__doc__)}</div>")
    members = inspect.getmembers(
        mod,
        lambda obj: (inspect.isclass(obj) or inspect.isfunction(obj))
        and getattr(obj, "__module__", "").startswith(modname),
    )
    for name, obj in members:
        try:
            sig = str(inspect.signature(obj))
        except (ValueError, TypeError):
            sig = "(...)"
        kind = "class" if inspect.isclass(obj) else "def"
        parts.append(f"<div class='sig'>{kind} <b>{name}</b>{html.escape(sig)}</div>")
        doc = inspect.getdoc(obj)
        if doc:
            parts.append(f"<div class='doc'>{html.escape(doc)}</div>")
        if inspect.isclass(obj):
            for mname, meth in inspect.getmembers(obj, inspect.isfunction):
                if mname.startswith("_") or meth.__qualname__.split(".")[0] != name:
                    continue
                try:
                    msig = str(inspect.signature(meth))
                except (ValueError, TypeError):
                    msig = "(...)"
                parts.append(
                    f"<div class='sig' style='margin-left:1.5em'>"
                    f"{name}.<b>{mname}</b>{html.escape(msig)}</div>"
                )
                mdoc = inspect.getdoc(meth)
                if mdoc:
                    first = mdoc.splitlines()[0]
                    parts.append(
                        f"<div class='doc' style='margin-left:3em'>"
                        f"{html.escape(first)}</div>"
                    )
    return "\n".join(parts)


def fallback_build() -> None:
    sys.path.insert(0, str(DOCS.parent))
    BUILD.mkdir(parents=True, exist_ok=True)
    (BUILD / "manual").mkdir(exist_ok=True)
    (BUILD / "api").mkdir(exist_ok=True)

    for page in PAGES:
        rst = (SOURCE / f"{page}.rst").read_text()
        body = _render_rst(rst)
        title = rst.splitlines()[0]
        depth = page.count("/")
        (BUILD / f"{page}.html").write_text(_page(title, body, depth))

    # API index + per-package pages via introspection
    api_index = ["<h1>API reference</h1>", "<ul>"]
    for pkgname in API_PACKAGES:
        pkg = importlib.import_module(pkgname)
        modules = [pkgname]
        if hasattr(pkg, "__path__"):
            for info in pkgutil.walk_packages(pkg.__path__, pkgname + "."):
                modules.append(info.name)
        for modname in modules:
            fname = f"api/{modname}.html"
            try:
                html_body = _api_module_html(modname)
            except Exception as err:  # optional deps may be missing
                html_body = f"<h1>{modname}</h1><p>import failed: {err}</p>"
            (BUILD / fname).write_text(_page(modname, html_body, 1))
            api_index.append(f'<li><a href="{fname}">{modname}</a></li>')
    api_index.append("</ul>")
    (BUILD / "api.html").write_text(_page("API", "\n".join(api_index)))
    print(f"fallback docs built: {BUILD}")


def main() -> None:
    force_fallback = "--force-fallback" in sys.argv
    if not force_fallback and try_sphinx():
        print(f"sphinx docs built: {BUILD}")
        return
    fallback_build()


if __name__ == "__main__":
    main()
