"""Docs stay honest: every test path/symbol cited in docs/PARITY.md exists.

Round-3 verdict found parity rows citing a ``tests/test_launch.py`` that was
never written — a claim citing a nonexistent test corrodes trust in the whole
table, so this check makes the table self-verifying.
"""
import ast
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CITE_RE = re.compile(r"(tests/test_[\w./]+?\.py)(?:::(\w+\*?))?")


def _test_symbols(path: Path):
    tree = ast.parse(path.read_text())
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            names.add(node.name)
    return names


def test_parity_md_citations_exist():
    text = (REPO / "docs" / "PARITY.md").read_text()
    missing = []
    symbols_cache = {}
    for m in CITE_RE.finditer(text):
        rel, sym = m.group(1), m.group(2)
        p = REPO / rel
        if not p.exists():
            missing.append(rel)
            continue
        if sym:
            if rel not in symbols_cache:
                symbols_cache[rel] = _test_symbols(p)
            syms = symbols_cache[rel]
            # a trailing * cites a family of tests by prefix
            hit = any(s.startswith(sym[:-1]) for s in syms) \
                if sym.endswith("*") else sym in syms
            if not hit:
                missing.append(f"{rel}::{sym}")
    assert not missing, f"PARITY.md cites nonexistent tests: {missing}"


def test_docstring_test_citations_exist():
    """Any `tests/...py` path named in a pq3d_tpu module docstring exists
    (the round-3 device_maps.py docstring promised a test that didn't)."""
    missing = []
    for src in (REPO / "pq3d_tpu").rglob("*.py"):
        text = src.read_text()
        for m in CITE_RE.finditer(text):
            if not (REPO / m.group(1)).exists():
                missing.append(f"{src.relative_to(REPO)} -> {m.group(1)}")
    assert not missing, f"source cites nonexistent tests: {missing}"
