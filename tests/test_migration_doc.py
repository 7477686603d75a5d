"""Executes every ```python fence in docs/MIGRATION.md, in order, in one
shared namespace — the migration cookbook's snippets are promises to
reference users and must keep running verbatim."""

import os
import pathlib
import re

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "MIGRATION.md"


def test_migration_snippets_run(tmp_path, monkeypatch):
    text = DOC.read_text()
    snippets = re.findall(r"```python\n(.*?)```", text, re.S)
    assert len(snippets) >= 8, f"expected the cookbook's snippets, got {len(snippets)}"
    monkeypatch.chdir(tmp_path)
    os.makedirs("out", exist_ok=True)
    ns: dict = {}
    for i, code in enumerate(snippets):
        try:
            exec(compile(code, f"MIGRATION.md#snippet{i + 1}", "exec"), ns)
        except Exception as e:
            raise AssertionError(
                f"MIGRATION.md snippet {i + 1} failed: {type(e).__name__}: {e}\n"
                f"--- snippet ---\n{code}") from e
    # spot-check the artifacts the doc claims
    assert (tmp_path / "out" / "tile.obj").stat().st_size > 0
    assert ns["sim"].height_map is not None
