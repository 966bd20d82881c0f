"""Structural guard: every ``tests/test_*.py`` path cited inside the
package (retirement rationales, docstrings, comments — the grading
audit trail) must name a file that actually exists, and a cited
``::test_function`` must exist inside that file.

Round-8 defect #2 was exactly this drift: a dqs retirement rationale
cited ``tests/test_flags.py``, which had never existed — a dangling
citation in the one place whose whole job is to explain a grading gap.
Same guard class as tests/test_catalog_window.py.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "idb_backend_spark"

# `::` may be followed by a line wrap inside a comment block
# (`...test_typed_schema.py::\n# test_dqs_...`), so \s* and an optional
# comment prefix sit between the separator and the function name.
_CITE = re.compile(r"tests/(test_\w+)\.py(?:\s*::\s*(?:#\s*)?(test_\w+))?")


def _cited() -> list[tuple[Path, str, str | None]]:
    out = []
    sources = list(PKG.rglob("*.py")) + [
        REPO / "__spark_entry__.py",
        REPO / "bench.py",
    ]
    for src in sources:
        text = src.read_text()
        for m in _CITE.finditer(text):
            out.append((src, m.group(1), m.group(2)))
    return out


def test_cited_test_files_exist():
    cites = _cited()
    assert cites, "expected at least one tests/ citation in the package"
    missing = []
    for src, fname, func in cites:
        tpath = REPO / "tests" / f"{fname}.py"
        if not tpath.exists():
            missing.append(f"{src.relative_to(REPO)} cites {fname}.py (absent)")
        elif func is not None and f"def {func}(" not in tpath.read_text():
            missing.append(
                f"{src.relative_to(REPO)} cites {fname}.py::{func} (no such test)"
            )
    assert not missing, "dangling test citations:\n" + "\n".join(missing)
