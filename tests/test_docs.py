"""Execute every python code block in docs/*.md.

The tutorials are the user-facing contract (reference parity:
``docs/examples/*.ipynb``); running them end-to-end keeps the documented API
honest.  Blocks within one document share a namespace, like notebook cells.
"""

import pathlib
import re

import pytest

DOCS = sorted(
    (pathlib.Path(__file__).parent.parent / "docs").glob("*.md"),
    key=lambda p: p.name,
)

_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(path):
    return _BLOCK.findall(path.read_text())


@pytest.mark.slow
@pytest.mark.parametrize("doc", DOCS, ids=lambda p: p.name)
def test_tutorial_runs(doc, tmp_path, monkeypatch):
    blocks = _blocks(doc)
    if not blocks:
        pytest.skip(f"{doc.name} has no python blocks")
    monkeypatch.chdir(tmp_path)  # tutorials save checkpoints to cwd
    ns = {"__name__": f"docs.{doc.stem}"}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{doc.name}[block {i}]", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"{doc.name} block {i} failed: {type(e).__name__}: {e}"
            ) from e


def test_api_docs_current():
    """docs/api/ is generated (scripts/gen_api_docs.py) and committed; this
    re-generates in a temp dir and diffs, so the reference can never go
    stale (the CI ``docs`` group runs the same check)."""
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "gen_api_docs.py"),
         "--check"],
        capture_output=True, text=True, timeout=280,
    )
    assert out.returncode == 0, out.stdout + out.stderr
